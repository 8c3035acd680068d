package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CorpusStreams, EventStreams}

/** Restart-recovery parity: every stateful streaming family is killed
  * mid-stream and resumed from its checkpoint, then re-asserted against
  * the batch equivalent over ALL the data. The restarted query is a NEW
  * `start()` with the SAME checkpoint directory and the same plan — the
  * state store must restore (counters, dedup keys, as-of latest-right,
  * window partials) or the post-restart output diverges from batch in a
  * way each assertion is built to catch (double emission, un-dropped
  * duplicate, missing match, restarted counter).
  *
  * foreachBatch sinks dedupe by batchId: on recovery Structured
  * Streaming MAY replay the last uncommitted batch, and exactly-once
  * parity is only promised for idempotent sinks.
  */
class RestartRecoverySpec extends AnyFunSuite {
  import Fixture.init

  /** foreachBatch collector that is idempotent under batch replay. */
  private class BatchCollector {
    private val seen = scala.collection.mutable.HashSet[Long]()
    private val rowsB =
      scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    def sink(df: DataFrame, batchId: Long): Unit = {
      val rows = df.collect() // collect OUTSIDE the lock
      synchronized { if (seen.add(batchId)) rowsB ++= rows }
    }
    def rows: Seq[org.apache.spark.sql.Row] = synchronized(rowsB.toList)
  }

  private def ckptDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ckpt-$tag").toString

  /** Run `plan` over the stream twice against one checkpoint: feed
    * `chunk1`, stop (the kill), start a FRESH query on the same
    * checkpoint, feed `chunk2`. Both query incarnations share one
    * idempotent collector; returns everything emitted across both, in
    * emission order. */
  private def runWithRestart[A: org.apache.spark.sql.Encoder](
      s: SparkSession, plan: DataFrame => DataFrame, mode: String,
      chunk1: Seq[A], chunk2: Seq[A], tag: String)
      : Seq[org.apache.spark.sql.Row] = {
    val ms = MemoryStream[A](s)
    val ckpt = ckptDir(tag)
    val collector = new BatchCollector
    def startQuery() = plan(ms.toDF())
      .writeStream.outputMode(mode)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        collector.sink(df, bid)
      }
      .start()
    val q1 = startQuery()
    try {
      ms.addData(chunk1)
      q1.processAllAvailable()
    } finally q1.stop()
    // the restart: a brand-new query object, same checkpoint ⇒ the
    // state store and committed offsets must restore
    val q2 = startQuery()
    try {
      ms.addData(chunk2)
      q2.processAllAvailable()
    } finally q2.stop()
    collector.rows
  }

  test("milestone counters survive a restart: crossings straddling the " +
      "kill emit exactly once, from the restored count") {
    val s = init()
    import s.implicits._
    // user 1: 8 events then 5 more (every=10 → the only crossing is AFTER
    // the restart, provable only with restored state: a reset counter
    // would reach 5, not 13, and emit nothing). user 2: crosses once
    // before the kill and once after (a replayed chunk1 would emit its
    // first crossing twice; the batchId dedup plus state transactionality
    // must keep it single).
    def ev(uid: Long, i: Int): (Long, java.sql.Timestamp) =
      (uid, new java.sql.Timestamp(3600000L + i * 60000L))
    val chunk1 = (0 until 8).map(ev(1L, _)) ++ (0 until 12).map(ev(2L, _))
    val chunk2 = (8 until 13).map(ev(1L, _)) ++ (12 until 21).map(ev(2L, _))
    val got = runWithRestart[(Long, java.sql.Timestamp)](
      s,
      df => EventStreams.userMilestones(
        df.select(col("_1").as("user_id"), col("_2").as("event_time")),
        every = 10),
      "append", chunk1, chunk2, "milestones")
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // batch truth: user 1 (13 events) crosses 10 once; user 2 (21) 10, 20
    assert(got == Seq((1L, 10L), (2L, 10L), (2L, 20L)))
  }

  test("streaming dedup state survives a restart: ids first seen before " +
      "the kill are still dropped after it") {
    val s = init()
    import s.implicits._
    def ev(id: Long, i: Int): (Long, java.sql.Timestamp) =
      (id, new java.sql.Timestamp(3600000L + i * 1000L))
    val chunk1 = (0L until 20L).map(id => ev(id, id.toInt))
    // chunk2 re-sends ids 0..9 (must be dropped via restored state) and
    // adds fresh ids 20..24
    val chunk2 = (0L until 10L).map(id => ev(id, 30 + id.toInt)) ++
      (20L until 25L).map(id => ev(id, 40 + id.toInt))
    val got = runWithRestart[(Long, java.sql.Timestamp)](
      s,
      df => EventStreams.dedupEvents(
        df.select(col("_1").as("event_id"), col("_2").as("event_time"))),
      "append", chunk1, chunk2, "dedup")
      .map(_.getLong(0)).sorted
    assert(got == (0L until 25L).toList,
      "each id exactly once across the restart")
  }

  test("as-of enrichment state survives a restart: lefts arriving after " +
      "the kill still match rights from before it") {
    val s = init()
    import s.implicits._
    // chunk 1: all rights (latest per key becomes state) + a few lefts;
    // chunk 2 (post-restart): only lefts — every match they find proves
    // the latest-right state restored
    val rights = (0 until 30).map(i => (i % 5L, i * 10L, true, s"R$i"))
    val earlyLefts = (0 until 5).map(i => (i % 5L, 500L + i, false, s"L$i"))
    val lateLefts = (0 until 20).map(i => (i % 5L, 600L + i, false, s"M$i"))
    val got = runWithRestart[(Long, Long, Boolean, String)](
      s,
      df => EventStreams.asofEnrich(
        df.toDF("key", "ts", "isRight", "payload")),
      "update", rights ++ earlyLefts, lateLefts, "asof")
      .map(r => (r.getLong(0), r.getLong(1),
        Option(if (r.isNullAt(2)) null else r.getString(2))))
      .sortBy(t => (t._1, t._2, t._3.getOrElse("")))
    val l = (earlyLefts ++ lateLefts).map(r => (r._1, r._2, r._4))
      .toDF("key", "lts", "lid")
    val r = rights.map(x => (x._1, x._2, x._4)).toDF("key", "rts", "rpay")
    val want = graft.ops.OrderedJoins.asofJoinBackward(
        l, r, Seq("key"), "lts", "rts")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1),
        Option(if (x.isNullAt(4)) null else x.getString(4))))
      .sortBy(t => (t._1, t._2, t._3.getOrElse("")))
    assert(got.nonEmpty && got.count(_._3.isDefined) == got.size,
      "every left must find its pre-restart right")
    assert(got.toList == want.toList)
  }

  test("windowed aggregation partials survive a restart: post-restart " +
      "rows update the pre-restart window to the batch totals") {
    val s = init()
    import s.implicits._
    def ev(t: String, i: Int, v: Double)
        : (String, java.sql.Timestamp, Double) =
      (t, new java.sql.Timestamp(36000000L + i * 60000L), v)
    val chunk1 = (0 until 10).map(i => ev("view", i, i * 1.5)) ++
      (0 until 6).map(i => ev("click", i, 2.0))
    val chunk2 = (10 until 25).map(i => ev("view", i, 1.0)) ++
      (6 until 9).map(i => ev("click", i, 3.0))
    val got = runWithRestart[(String, java.sql.Timestamp, Double)](
      s,
      df => EventStreams.hourlyAggregates(
        df.select(col("_1").as("event_type"), col("_2").as("event_time"),
          col("_3").as("value"))),
      "update", chunk1, chunk2, "hourly")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // update mode re-emits a window row per batch that touches it — the
    // LAST emission per (window, type) must equal the batch totals
    val last = got.zipWithIndex
      .groupBy(t => (t._1._1, t._1._2))
      .map { case (k, vs) => k -> vs.maxBy(_._2)._1 }
    val want = (chunk1 ++ chunk2).toDF("event_type", "event_time", "value")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(last.nonEmpty && last == want)
  }

  test("countmin counters survive a restart: restored counts merge to " +
      "the batch sketch over all rows") {
    val s = init()
    import s.implicits._
    val texts1 = (0 until 40).map(i => (i.toLong, s"alpha beta w$i"))
    val texts2 = (40 until 80).map(i => (i.toLong, s"alpha gamma w$i"))
    val (depth, width) = (4, 64)
    val got = runWithRestart[(Long, String)](
      s,
      df => CorpusStreams.cmCounters(
        df.toDF("doc_id", "text"), "text", depth, width),
      "update", texts1, texts2, "cm")
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // LAST value per (d, bucket) wins (update mode re-emits counters);
    // a post-restart state reset would show "alpha"'s counter dropping
    // back to 40 instead of reaching 80
    val last = got.zipWithIndex.groupBy(t => (t._1._1, t._1._2))
      .map { case (k, vs) => k -> vs.maxBy(_._2)._1._3 }
    val want = graft.ops.Sketches.countMinSketch(
        (texts1 ++ texts2).toDF("doc_id", "text"), "text", depth, width)
      .collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getLong(1)) ->
        r.getLong(2))
      .toMap
    assert(last.nonEmpty && last == want)
  }
}
