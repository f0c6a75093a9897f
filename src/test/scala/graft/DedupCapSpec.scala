package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.operators.Dedup.MinHashConfig

/** The candidate-volume guard (MinHashConfig.maxBucketSize): a planted
  * hot bucket — 12 byte-identical boilerplate docs whose every band
  * collides — must be dropped by the cap, the genuine near-dup pair
  * elsewhere must survive, and lshBucketCensus must report EXACTLY the
  * dropped mass. Default (cap off) output is unchanged. */
class DedupCapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val boiler =
    "subscribe to our newsletter for daily updates terms of service apply " +
      "all rights reserved contact us at the address below for more information"
  private val baseA =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from the warm windowsill and the birds sing in the garden outside"
  private val baseB =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from the warm windowsill and the birds sing in the garden today"
  private def distinctDoc(i: Int) =
    s"unique document number $i with its own content " +
      (1 to 20).map(j => s"token${i}x$j").mkString(" ")

  private val docs = (
    (1 to 12).map(i => (i.toLong, boiler)) ++            // hot bucket: 12 clones
      Seq((100L, baseA), (101L, baseB)) ++               // genuine near-dup pair
      (200 to 210).map(i => (i.toLong, distinctDoc(i)))  // background singletons
  ).toDF("doc_id", "text")

  private val cfg = MinHashConfig(numPerm = 128, bands = 32, shingleSize = 5,
    threshold = 0.9)

  private def pairs(c: MinHashConfig): Set[(Long, Long)] =
    Dedup.minhashNearDupPairs(docs, "doc_id", "text", c)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("uncapped: clone pairs and the near-dup pair are all found") {
    val got = pairs(cfg)
    val clonePairs = (for (a <- 1 to 12; b <- (a + 1) to 12)
      yield (a.toLong, b.toLong)).toSet
    assert(clonePairs.subsetOf(got), s"missing clone pairs: ${clonePairs -- got}")
    assert(got.contains((100L, 101L)), "genuine near-dup pair missing")
  }

  test("capped: the hot bucket is dropped, the genuine pair survives") {
    val got = pairs(cfg.copy(maxBucketSize = Some(5)))
    assert(got.contains((100L, 101L)),
      "the cap must not touch pairs outside mega-buckets")
    assert(!got.exists(p => p._1 <= 12 && p._2 <= 12),
      s"clone pairs should be gone, got $got")
  }

  test("census reports exactly the dropped bucket mass") {
    val r = Dedup.lshBucketCensus(docs, "doc_id", "text",
      cfg.copy(maxBucketSize = Some(5))).head()
    val (nb, nbd, nrd, npd) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // the 12 clones share ALL 32 band buckets; nothing else plausibly
    // lands in those buckets (verified by the exact equalities below)
    assert(nbd == 32L, s"buckets dropped: $nbd")
    assert(nrd == 32L * 12, s"rows dropped: $nrd")
    assert(npd == 32L * (12 * 11 / 2), s"pairs dropped: $npd")
    assert(nb >= nbd)
  }

  test("a cap below 2 is rejected") {
    intercept[IllegalArgumentException](cfg.copy(maxBucketSize = Some(1)))
  }
}
