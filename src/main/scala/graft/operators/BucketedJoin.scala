package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-write co-located joins: pay the join shuffle ONCE at write time.
  *
  * At 100 TB the dominant cost of a fact-fact join is the exchange of both
  * sides. Bucketing both tables by their join key at write time
  * (`bucketBy(n, key).sortBy(key)`) persists the hash partitioning in the
  * catalog, so every subsequent join on that key plans as a sort-merge join
  * over the EXISTING bucket files — no exchange, and with sorted buckets no
  * sort either. This is the batch analogue of reader keying its Kafka topic
  * partitions by primary key (lib/kafkalib partition-key messages) so
  * downstream consumers see co-located streams.
  *
  * The bucket count is a layout contract: both sides must use the same `n`
  * for the co-located plan to kick in (Spark also tolerates one side being
  * a multiple of the other via bucket coalescing). Choose n so each bucket
  * file stays in the hundreds-of-MB range at full scale.
  */
object BucketedJoin {

  /** Write `df` as a bucketed+sorted catalog table (idempotent overwrite).
    *
    * The repartition on the bucket key aligns write tasks with buckets so
    * each bucket lands as ONE file: Spark only trusts (and reuses) the
    * per-bucket sort order when a bucket is a single file — with multiple
    * files per bucket every downstream merge join re-sorts. Same hash both
    * places (Murmur3 mod n), so the repartition is also the write-side
    * half of the join shuffle being paid once. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int = 8,
      path: Option[String] = None): Unit = {
    val w = df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
    // an explicit path makes the table external (data under the caller's
    // work dir instead of the session warehouse)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With matching bucket
    * counts the physical plan is exchange-free (asserted in
    * BucketedJoinSpec). */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
