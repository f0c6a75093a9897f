package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TtlDedup

/** TTL-expiring dedup state vs a driver-side ttlmap reference model
  * (lib/storage/ttlmap/ttlmap.go:1-187 semantics: accept a key when no
  * live entry exists; an entry expires TTL after the ACCEPTED event's
  * time — a dropped duplicate does NOT re-arm the clock).
  *
  * The model mirrors the sequential-run harness: one data batch per run;
  * the watermark advances to max-event-time-so-far minus TTL when the run
  * drains (AvailableNow ends with a no-data batch that commits the updated
  * watermark and runs eviction), so lookups in run i see state evicted at
  * the watermark through run i-1. TTL is 637 s against whole-minute event
  * times so no expiry can ever tie the watermark — the model is then
  * insensitive to the evictor's < vs <= boundary.
  *
  * Randomized lifecycles (fixed seed — CI-stable) catch boundary drift an
  * example spec would miss: re-arrivals landing just inside/outside the
  * TTL window, and state re-armed from a dropped event's timestamp. */
class TtlDedupSpec extends AnyFunSuite {
  import TestSpark._

  private val ttlSec = 637L
  private val base = 1704067200L // 2024-01-01 00:00:00 UTC, seconds

  /** Reference model over (key, minute) batches: returns accepted pairs. */
  private def model(batches: Seq[Seq[(Long, Long)]]): Set[(Long, Long)] = {
    val state = scala.collection.mutable.Map[Long, Long]() // key -> expiry (sec)
    val accepted = scala.collection.mutable.Set[(Long, Long)]()
    var wm = Long.MinValue // watermark in force when the next run's lookups happen
    batches.foreach { batch =>
      state.filterInPlace { case (_, expiry) => expiry > wm }
      batch.foreach { case (k, m) =>
        if (!state.contains(k)) {
          state(k) = m * 60 + ttlSec
          accepted += ((k, m))
        }
      }
      wm = math.max(wm, batch.map(_._2).max * 60 - ttlSec)
    }
    accepted.toSet
  }

  test("sequential watermark TTL dedup matches the ttlmap model on random lifecycles") {
    val rnd = new scala.util.Random(9301L)
    (1 to 3).foreach { round =>
      // 6-10 batches; each batch: 1-4 keys at a batch-monotone minute
      // (arrival order == event-time order across batches, matching the
      // harness's one-file-per-run construction; gaps of 0-30 min put
      // some re-arrivals inside the TTL window and some beyond it)
      var minute = 0L
      val batches = (1 to 6 + rnd.nextInt(5)).map { _ =>
        minute += rnd.nextInt(31)
        val m = minute
        (1 to 1 + rnd.nextInt(4)).map(_ => (rnd.nextInt(5).toLong, m)).distinct
      }
      val dfs = batches.map { b =>
        val rows = b.map { case (k, m) => (k, new Timestamp((base + m * 60) * 1000L)) }
        import spark.implicits._
        rows.toDF("k", "ts")
      }
      val got = TtlDedup.runSequential(spark, dfs,
        s"/tmp/graft_test_ttl_$round", Seq("k"), "ts", s"$ttlSec seconds")
        .select(col("k"), expr(s"(CAST(ts AS LONG) - $base) div 60").as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === model(batches.map(_.toSeq)), s"batches=$batches")
    }
  }
}
