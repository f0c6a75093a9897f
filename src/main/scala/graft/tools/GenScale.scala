package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for LOCAL scale validation (not part of the library
  * surface): replicates an existing testdata dir `factor`x with key-space
  * offsets, so per-query scaling factors (sf0.1 -> sf1) can be MEASURED
  * instead of argued. Foreign keys stay consistent (each copy offsets
  * l_orderkey and o_orderkey by the same span, etc.); dimension tables
  * (nation/region) keep their TPC-H fixed size.
  *
  * Two copies of the same text/vector would be exact twins, which turns the
  * dedup/ANN workload quadratic ACROSS copies and measures pair explosion,
  * not engine scaling — so copies are decorrelated while preserving every
  * INTRA-copy similarity structure exactly:
  *  - documents: a per-copy substitution cipher over the lowercase letters
  *    (deterministic Fisher-Yates shuffle of a-z; spaces, digits and
  *    punctuation fixed). A bijective character map preserves every
  *    intra-copy similarity EXACTLY — token boundaries, lengths, char- and
  *    word-shingle set cardinalities, repetition structure — while making
  *    cross-copy char n-grams disjoint. (A per-token suffix was tried
  *    first and failed for CHAR n-grams: interior trigrams survive the
  *    suffix, so cross-copy docs still collide in LSH bands at ~0.7
  *    similarity and candidate pairs grow with copies^2.);
  *  - embeddings: elementwise deterministic +-1 sign mask per copy
  *    (cos(a*s, b*s) = cos(a, b) within a copy; expected cross-copy cosine
  *    ~ N(0, 1/dim), far below every near-dup threshold).
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <outDir> <factor>
  *
  * DO NOT COMPOSE applications (e.g. sf0.1 →x10→ sf1 →x10→ sf10):
  * generate each target directly from the base with one factor. Sign
  * masks are elementwise-COMMUTATIVE, so under composition the composed
  * copy (c, d) and copy (d, c) receive the identical mask s_c⊙s_d and
  * their embedding vectors are bit-equal — measured in round 11 as
  * ~207k real cross-copy duplicate pairs at cos ≥ 0.9 in a composed
  * sf10, which correctly (and confusingly) trip the dedup_semantic
  * planted-pairs-only claim. One direct application has no such
  * collision; the text cipher composes as (non-commutative) permutation
  * composition and only dodges the same bug by accident. */
object GenScale {

  private def splitmix64(seed: Long): Long = graft.expressions.Sketch.splitmix64(seed)

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorStr) = args.take(3)
    val factor = factorStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def span(df: DataFrame, c: String): Long = df.agg(max(col(c))).head().getLong(0) + 1L

    val orderSpan = span(read("orders"), "o_orderkey")
    val custSpan = span(read("customer"), "c_custkey")
    val partSpan = span(read("part"), "p_partkey")
    val suppSpan = span(read("supplier"), "s_suppkey")
    val docSpan = span(read("documents"), "doc_id")
    val vecSpan = span(read("embeddings"), "vec_id")
    val eventSpan = span(read("events"), "event_id")
    val userSpan = span(read("events"), "user_id")

    /** Union of `factor` transformed copies of `t`, written to the out dir. */
    def scaled(t: String, files: Int)(copy: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      val all = (0 until factor).map(k => copy(base, k)).reduce(_ unionByName _)
      all.coalesce(files).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[genscale] $t x$factor done")
    }

    def off(c: String, k: Int, s: Long) = (col(c) + lit(k.toLong * s)).as(c)

    scaled("lineitem", 48) { (df, k) =>
      df.withColumn("l_orderkey", off("l_orderkey", k, orderSpan))
        .withColumn("l_partkey", off("l_partkey", k, partSpan))
        .withColumn("l_suppkey", off("l_suppkey", k, suppSpan))
    }
    scaled("orders", 16) { (df, k) =>
      df.withColumn("o_orderkey", off("o_orderkey", k, orderSpan))
        .withColumn("o_custkey", off("o_custkey", k, custSpan))
    }
    scaled("customer", 4) { (df, k) => df.withColumn("c_custkey", off("c_custkey", k, custSpan)) }
    scaled("supplier", 1) { (df, k) => df.withColumn("s_suppkey", off("s_suppkey", k, suppSpan)) }
    scaled("part", 2) { (df, k) => df.withColumn("p_partkey", off("p_partkey", k, partSpan)) }
    scaled("events", 16) { (df, k) =>
      df.withColumn("event_id", off("event_id", k, eventSpan))
        .withColumn("user_id", off("user_id", k, userSpan))
    }
    scaled("documents", 8) { (df, k) =>
      val alphabet = "abcdefghijklmnopqrstuvwxyz"
      val perm = alphabet.toCharArray
      // deterministic Fisher-Yates keyed by the copy index; k=0 stays identity
      if (k > 0) {
        var i = perm.length - 1
        while (i > 0) {
          val j = java.lang.Math.floorMod(splitmix64(k.toLong * 7919L + i), (i + 1).toLong).toInt
          val t = perm(i); perm(i) = perm(j); perm(j) = t
          i -= 1
        }
      }
      val text =
        if (k == 0) col("text")
        else translate(col("text"), alphabet, new String(perm))
      df.withColumn("doc_id", off("doc_id", k, docSpan))
        .withColumn("text", text)
    }
    val dim = read("embeddings").select(size(col("embedding"))).head().getInt(0)
    scaled("embeddings", 2) { (df, k) =>
      val mask = Array.tabulate(dim) { i =>
        if ((splitmix64(k.toLong * 100003L + i) & 1L) == 0L) 1.0f else -1.0f
      }
      val emb =
        if (k == 0) col("embedding")
        else zip_with(col("embedding"), array(mask.toIndexedSeq.map(lit): _*), (x, s) => x * s)
      df.withColumn("vec_id", off("vec_id", k, vecSpan))
        .withColumn("embedding", emb)
    }
    // fixed-size dimensions: straight copies
    for (t <- Seq("nation", "region")) {
      read(t).coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[genscale] $t copied")
    }
    println(s"[genscale] ALL DONE -> $out")
    spark.stop()
  }
}
