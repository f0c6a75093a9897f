package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{BinlogResume, GtidResume, ShardResume}

/** Randomized cross-check of the three replay guards against per-row
  * reference models (fixed seeds — CI-stable). Each guard encodes a
  * DIFFERENT resume semantic the reference sources use:
  *   GTID      — at-or-after  (gtid.go:11-52)
  *   binlog    — lexicographic (file, pos) at-or-after (offset.go:13-41)
  *   shard     — STRICTLY-after + TrimHorizon + processed-skip
  *               (shard.go:63-87)
  * The property runs catch semantic bleed between the three (e.g. an
  * accidental >= in the shard guard) that example-based specs can miss. */
class ResumeGuardPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("gtid: matches the at-or-after model over 15 random datasets") {
    val rnd = new scala.util.Random(8201L)
    (1 to 15).foreach { _ =>
      val sids = (0 until 1 + rnd.nextInt(4)).map(i => s"s$i")
      val rows = (1 to 1 + rnd.nextInt(40)).map { i =>
        (i.toLong, s"${sids(rnd.nextInt(sids.length))}:${rnd.nextInt(20)}")
      }
      val seen = sids.filter(_ => rnd.nextBoolean()).map(s => (s, rnd.nextInt(20).toLong))
      val expected = rows.filter { case (_, g) =>
        val Array(sid, tx) = g.split(":")
        seen.find(_._1 == sid).forall(tx.toLong >= _._2)
      }.map(_._1).toSet
      val got = GtidResume.shouldProcess(
        rows.toDF("event_id", "gtid"), "gtid", seen.toDF("sid", "highest"))
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"rows=$rows seen=$seen")
    }
  }

  test("binlog: matches the lexicographic at-or-after model over 15 random datasets") {
    val rnd = new scala.util.Random(8202L)
    (1 to 15).foreach { _ =>
      val keys = (0 until 1 + rnd.nextInt(3)).map(i => s"k$i")
      def file() = f"binlog.${1 + rnd.nextInt(4)}%06d"
      val rows = (1 to 1 + rnd.nextInt(40)).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.length)), file(), rnd.nextInt(100).toLong)
      }
      val seen = keys.filter(_ => rnd.nextBoolean()).map(k => (k, file(), rnd.nextInt(100).toLong))
      val expected = rows.filter { case (_, k, f, p) =>
        seen.find(_._1 == k).forall { case (_, wf, wp) => f > wf || (f == wf && p >= wp) }
      }.map(_._1).toSet
      val got = BinlogResume.shouldProcess(
        rows.toDF("event_id", "okey", "file", "pos"), "okey", "file", "pos",
        seen.toDF("okey", "wfile", "wpos"))
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"rows=$rows seen=$seen")
    }
  }

  test("shard: matches the strictly-after/TrimHorizon/processed model over 15 random datasets") {
    val rnd = new scala.util.Random(8203L)
    (1 to 15).foreach { _ =>
      val shards = (0 until 1 + rnd.nextInt(4)).map(i => s"sh$i")
      // sequence numbers span length boundaries on purpose
      def seq() = (1 + rnd.nextInt(2000)).toString
      val rows = (1 to 1 + rnd.nextInt(40)).map { i =>
        (i.toLong, shards(rnd.nextInt(shards.length)), seq())
      }
      val seen = shards.filter(_ => rnd.nextBoolean()).map { s =>
        (s, if (rnd.nextBoolean()) Some(seq()) else None, rnd.nextInt(4) == 0)
      }
      def numGt(a: String, b: String) = BigInt(a) > BigInt(b)
      val expected = rows.filter { case (_, sh, sq) =>
        seen.find(_._1 == sh) match {
          case None => true
          case Some((_, _, true)) => false
          case Some((_, None, _)) => true
          case Some((_, Some(w), _)) => numGt(sq, w)
        }
      }.map(_._1).toSet
      val got = ShardResume.shouldProcess(
        rows.toDF("event_id", "shard_id", "seq"), "shard_id", "seq",
        seen.toDF("shard_id", "last_seq", "processed"))
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(got === expected, s"rows=$rows seen=$seen")
    }
  }
}
