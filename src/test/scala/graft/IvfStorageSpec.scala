package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.sources.Tables

/** The write-time half of IVF: a list-partitioned corpus must let a probe
  * read prune to the probed lists at file-listing time. */
class IvfStorageSpec extends AnyFunSuite {
  import TestSpark._

  test("probe read scans only the probed lists' partitions") {
    val emb = Tables.embeddings(spark, Sf)
    val cents = Ann.trainCentroids(emb, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/corpus"
    Ann.writeListPartitioned(emb, "vec_id", "embedding", cents, dir)

    val probes = Seq(1L, 3L)
    val probe = Ann.readLists(spark, dir, probes)

    val pruned = probe.collect().map(_.getLong(0)).sorted
    val scans = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.toString.contains("PartitionFilters"),
      "partition filter missing from scan node")
    // pruning happens in the partition listing: the executed scan opened
    // only the probed lists' files (one file per list by construction)
    val allFiles = spark.read.parquet(dir).inputFiles.length
    val readFiles = scans.head.metrics("numFiles").value
    assert(readFiles == probes.size && allFiles == 8,
      s"scan read $readFiles of $allFiles files, expected ${probes.size}")

    // the probed subset is the same rows a full scan + filter yields
    val full = spark.read.parquet(dir).collect()
      .filter(r => probes.contains(r.getAs[Long]("list_id"))).map(_.getLong(0)).sorted
    assert(pruned.sameElements(full) && pruned.nonEmpty)
  }
}
