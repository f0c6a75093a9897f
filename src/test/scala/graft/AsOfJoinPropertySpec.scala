package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Randomized cross-check: AsOfJoin.lastMatch vs a brute-force per-row
  * reference over many small generated datasets (fixed seeds — CI-stable).
  * Exercises duplicate timestamps, cross-side ties, keys missing on either
  * side, and empty sides — shapes a hand-written example spec misses. */
class AsOfJoinPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def bruteForce(
      left: Seq[(Long, Long, Long)],                   // (k, ts, lid)
      right: Seq[(Long, Long, Long, Option[String])])  // (k, ts, rid, payload)
      : Map[Long, Option[(Long, Option[String])]] = {
    left.map { case (k, ts, lid) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= ts)
      // <=, then the greatest (ts, rid) wins, and BOTH carried columns come
      // from that same row — the operator's documented rule
      lid -> candidates.sortBy(r => (r._2, r._3)).lastOption.map(r => (r._3, r._4))
    }.toMap
  }

  test("matches brute force over 20 random datasets (incl. null payloads)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 20).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(4)
      val left = Seq.fill(1 + rnd.nextInt(12))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(10).toLong, rnd.nextLong(1L << 40)))
      val right = Seq.fill(rnd.nextInt(12))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(10).toLong, rnd.nextLong(1L << 40),
          if (rnd.nextBoolean()) Some(s"p${rnd.nextInt(5)}") else None))

      val out = AsOfJoin.lastMatch(
        left.toDF("k", "ts", "lid"),
        right.toDF("k", "ts", "rid", "payload"),
        Seq("k"), "ts", "rid", Seq("rid", "payload"))
        .collect()
        .map { r =>
          val img = Option(r.get(3)).map(_.asInstanceOf[Long])
            .map(rid => (rid, Option(r.getString(4))))
          r.getLong(2) -> img
        }
        .toMap

      val expected = bruteForce(left, right)
      assert(out == expected, s"trial $trial: left=$left right=$right")
    }
  }
}
