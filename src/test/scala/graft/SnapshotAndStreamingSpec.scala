package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.GraphAnalysisException
import graft.graph.Snapshot
import graft.streaming.EventStreams

/** Snapshot integrity (fixture F3, reference
  * `test/sql/path_finding/non-unique-vertices.test`) and Structured
  * Streaming smoke (memory sink fed by the sf0.001 events parquet). */
class SnapshotAndStreamingSpec extends AnyFunSuite {
  import Fixture.{init, spark}

  test("snapshot build: dense rowids + CSR offsets") {
    val s = init()
    import s.implicits._
    val v = Seq(10L, 20L, 30L).toDF("id")
    val e = Seq((10L, 20L), (10L, 30L), (20L, 30L)).toDF("src", "dst")
    val snap = Snapshot.build(s, v, "id", e, "src", "dst")
    val rows = snap.vertices.orderBy("rowid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((0L, 10L), (1L, 20L), (2L, 30L)))
    val offs = snap.csrOffsets.orderBy("rowid").collect()
      .map(_.getLong(1))
    assert(offs.toSeq == Seq(0L, 2L, 3L)) // outdegs 2,1,0 → offsets 0,2,3
    assert(snap.weightType == 0)
  }

  test("non-unique vertices detected — non-unique-vertices.test:36-45") {
    val s = init()
    import s.implicits._
    // vertices ('a'),('b'),('b') with edge a->b (fixture F3)
    val v = Seq(1L, 2L, 2L).toDF("id")
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val ex = intercept[GraphAnalysisException] {
      Snapshot.build(s, v, "id", e, "src", "dst")
    }
    assert(ex.msg.contains("Non-existent/non-unique vertices detected"))
  }

  test("dangling edge endpoint detected") {
    val s = init()
    import s.implicits._
    val v = Seq(1L, 2L).toDF("id")
    val e = Seq((1L, 99L)).toDF("src", "dst")
    val ex = intercept[GraphAnalysisException] {
      Snapshot.build(s, v, "id", e, "src", "dst")
    }
    assert(ex.msg.contains("Non-existent/non-unique vertices detected"))
  }

  test("weighted snapshot reports weight type — csr_get_w_type.cpp:9-14") {
    val s = init()
    import s.implicits._
    val v = Seq(1L, 2L).toDF("id")
    val ei = Seq((1L, 2L, 5L)).toDF("src", "dst", "w")
    assert(Snapshot.build(s, v, "id", ei, "src", "dst", Some("w"))
      .weightType == 1)
    val ed = Seq((1L, 2L, 5.0)).toDF("src", "dst", "w")
    assert(Snapshot.build(s, v, "id", ed, "src", "dst", Some("w"))
      .weightType == 2)
  }

  test("get_csr_w view streams weights in edge order — pgq_scan.cpp:113-153") {
    val s = init()
    import s.implicits._
    val v = Seq(1L, 2L, 3L).toDF("id")
    val ei = Seq((2L, 3L, 7L), (1L, 2L, 5L)).toDF("src", "dst", "w")
    val snap = Snapshot.build(s, v, "id", ei, "src", "dst", Some("w"))
    // dense rowids: 1→0, 2→1, 3→2; (src,dst) order ⇒ weights 5 then 7
    assert(snap.csrWeights.collect().map(r => r.getLong(2)).toSeq ==
      Seq(5L, 7L))
    val unweighted = Snapshot.build(s, v, "id", ei, "src", "dst")
    intercept[GraphAnalysisException] { unweighted.csrWeights }
  }

  test("readEventStream starts on an empty drop directory (schema " +
      "probe falls back instead of failing inference)") {
    val s = init()
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-drop")
    val stream = EventStreams.readEventStream(s, dir.toString)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("empty_drop_out").start()
    try {
      q.processAllAvailable()
      assert(s.table("empty_drop_out").count() == 0L)
    } finally q.stop()
  }

  test("streaming hourly aggregates match the batch equivalent") {
    val s = init()
    val stream = EventStreams.readEventStream(s, "/root/testdata/sf0.001/events*")
    // complete mode on a one-shot file stream processes everything; the
    // watermark never closes windows in processAllAvailable, so use
    // complete output to observe all windows
    val q = EventStreams.hourlyAggregates(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val got = s.table("hourly_out")
      val batch = SparkEntry.queries("q29_events_window")(
        s, "/root/testdata/sf0.001")
        .select(col("hour_ms"), col("event_type"), col("n"))
      val a = got.select("hour_ms", "event_type", "n").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      val b = batch.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(a.nonEmpty && a.toSeq == b.toSeq)
    } finally q.stop()
  }

  test("streaming dedup drops repeated ids within the watermark") {
    val s = init()
    val stream = EventStreams.readEventStream(s, "/root/testdata/sf0.001/events*")
    val q = EventStreams.dedupEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val n = s.table("dedup_out").count()
      val distinct = s.table("dedup_out").select("event_id").distinct().count()
      assert(n == distinct && n > 0)
    } finally q.stop()
  }

  test("streaming weighted reservoir converges to the batch sample " +
      "regardless of arrival order and batching") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.Row
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("lang"),
        col("n_chars").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // three unordered chunks covering every row exactly once (shuffled
    // deterministically, split in thirds), plus a re-delivery of part of
    // chunk 1 inside chunk 3 (the merge must be idempotent)
    val shuffled = docs.sortBy(d => d._1 * 2654435761L % 97)
    val third = (shuffled.length + 2) / 3
    val parts = shuffled.grouped(third).toSeq
    val chunks = Seq(parts(0), parts(1), parts(2) ++ parts(0).take(5))
    val ms = MemoryStream[(Long, String, Double)](s)
    val latest =
      new scala.collection.concurrent.TrieMap[String, Set[(Long, Long, Double)]]()
    val q = graft.streaming.CorpusStreams.weightedReservoir(
        ms.toDF().toDF("doc_id", "stratum", "weight"), k = 7,
        keyCol = "doc_id", stratumCol = "stratum", weightCol = "weight")
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().groupBy(_.getString(0)).foreach { case (st, rows) =>
          latest(st) = rows.map((r: Row) =>
            (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        }
      }.start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val batch = graft.ops.Sampling.weightedReservoir(
        docs.toSeq.toDF("doc_id", "stratum", "w"),
        "doc_id", "stratum", col("w"), k = 7)
      .select(col("stratum"), col("sample_rank"), col("doc_id"),
        col("sample_score"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (st, rows) => st -> rows.map(r =>
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet }
    assert(latest.nonEmpty && batch.nonEmpty)
    assert(latest.keySet == batch.keySet)
    batch.foreach { case (st, want) =>
      assert(latest(st) == want, s"stratum $st diverged from batch")
    }
  }

  test("streaming HLL registers and Bloom bits converge to the batch " +
      "sketches under reordering and redelivery") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sk = graft.ops.Sketches
    val keys = (1L to 500L).toArray
    val shuffled = keys.sortBy(k => k * 2654435761L % 101)
    val third = (shuffled.length + 2) / 3
    val parts = shuffled.grouped(third).toSeq
    // redeliver a slice of chunk 1 inside chunk 3: idempotent merges
    // must absorb it
    val chunks = Seq(parts(0), parts(1), parts(2) ++ parts(0).take(20))

    // HLL: accumulate the latest emitted rank per register
    val msH = MemoryStream[Long](s)
    val regs = new scala.collection.concurrent.TrieMap[Long, Long]()
    val qh = graft.streaming.CorpusStreams
      .hllRegisters(msH.toDF().toDF("k"), "k", b = 8)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => regs(r.getLong(0)) = r.getLong(1))
      }.start()
    try {
      chunks.foreach { c => msH.addData(c.toSeq); qh.processAllAvailable() }
    } finally qh.stop()
    val batchRegs = sk.hllRegisters(keys.toSeq.toDF("k"), col("k"), b = 8)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    assert(regs.nonEmpty && regs.toMap == batchRegs)

    // Bloom: append-once bit emission must union to the batch bit set
    val msB = MemoryStream[Long](s)
    val bits = scala.collection.mutable.Set[Long]()
    var emitted = 0L
    val qb = graft.streaming.CorpusStreams
      .bloomBits(msB.toDF().toDF("k"), "k", m = 1 << 12, k = 4)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
        emitted += rows.length
        bits ++= rows.map(_.getLong(0))
        ()
      }.start()
    try {
      chunks.foreach { c => msB.addData(c.toSeq); qb.processAllAvailable() }
    } finally qb.stop()
    val batchBits = sk.bloomBits(keys.toSeq.toDF("k"), col("k"),
      m = 1 << 12, k = 4).as[Long].collect().toSet
    assert(bits.toSet == batchBits)
    // exactly-once emission: no position is ever emitted twice
    assert(emitted == bits.size)
  }

  test("streaming CountMin counters converge to the batch sketch; an " +
      "at-least-once source is absorbed by the keyed-dedup composition") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sk = graft.ops.Sketches
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .filter(col("text").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val shuffled = docs.sortBy(d => d._1 * 2654435761L % 97)
    val third = (shuffled.length + 2) / 3
    val parts = shuffled.grouped(third).toSeq
    // chunk 3 re-delivers part of chunk 1: addition is NOT idempotent, so
    // the operator composes a doc-id dedup in front (the documented
    // at-least-once recipe) and must still equal the batch sketch
    val chunks = Seq(parts(0), parts(1), parts(2) ++ parts(0).take(7))
    val (depth, width) = (4, 64)
    val ms = MemoryStream[(Long, String)](s)
    val counters = new scala.collection.concurrent.TrieMap[(Int, Long), Long]()
    val q = graft.streaming.CorpusStreams.cmCounters(
        ms.toDF().toDF("doc_id", "text").dropDuplicates("doc_id"),
        "text", depth, width)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          counters((r.getInt(0), r.getLong(1))) = r.getLong(2))
      }.start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val batch = sk.countMinSketch(docs.toSeq.toDF("doc_id", "text"),
        "text", depth, width)
      .collect()
      .map(r => (r.getAs[Number](0).intValue(), r.getLong(1)) ->
        r.getLong(2)).toMap
    assert(counters.nonEmpty)
    assert(counters.toMap == batch)
  }

  test("streaming as-of enrichment converges to the batch as-of join " +
      "under time-ordered batching; right redelivery is absorbed") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // deterministic fixture: 60 lefts + 45 rights over 9 keys
    val lefts = (0 until 60).map(i =>
      (math.abs((i * 2654435761L) % 9), (i * 48271L) % 100, false,
        s"L$i"))
    val rights = (0 until 45).map(i =>
      (math.abs((i * 97178899L) % 9), (i * 16807L) % 100, true, s"R$i"))
    val all = (lefts ++ rights).sortBy(r => (r._2, !r._3, r._4))
    // three batches split by TIME (the documented contract), shuffled
    // WITHIN each batch; a slice of batch-1 rights re-delivered in
    // batch 3 (must be absorbed by the max merge)
    val third = (all.length + 2) / 3
    val parts = all.grouped(third).toSeq
    val chunks = Seq(
      parts(0).sortBy(_._4.hashCode),
      parts(1).sortBy(_._4.hashCode),
      (parts(2) ++ parts(0).filter(_._3).take(5)).sortBy(_._4.hashCode))
    val ms = MemoryStream[(Long, Long, Boolean, String)](s)
    val got = scala.collection.mutable.ArrayBuffer[
      (Long, Long, Option[String])]()
    val q = graft.streaming.EventStreams.asofEnrich(
        ms.toDF().toDF("key", "ts", "isRight", "payload"))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          got += ((r.getLong(0), r.getLong(1),
            Option(if (r.isNullAt(2)) null else r.getString(2)))))
      }.start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // batch oracle: the as-of operator itself over the same rows (left
    // payload carried as the row id so duplicates stay distinct)
    val l = lefts.map(r => (r._1, r._2, r._4)).toDF("key", "lts", "lid")
    val r = rights.map(x => (x._1, x._2, x._4)).toDF("key", "rts", "rpay")
    // multiset comparison on (key, ts, match): two lefts sharing
    // (key, ts) get the SAME match by determinism, so identity of the
    // individual left row doesn't matter
    val want = graft.ops.OrderedJoins.asofJoinBackward(
        l, r, Seq("key"), "lts", "rts")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1),
        Option(if (x.isNullAt(4)) null else x.getString(4))))
      .sortBy(t => (t._1, t._2, t._3.getOrElse("")))
    assert(got.size == lefts.size)
    assert(got.toList.sortBy(t => (t._1, t._2, t._3.getOrElse(""))) ==
      want.toList)
  }

  test("asof enrichment equal-ts tie-break is bit-identical to the batch " +
      "max-struct rule for supplementary-plane payloads") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // U+1F600 sorts BELOW U+FFFD in Java String (UTF-16 code-unit) order
    // but ABOVE it in Spark's UTF8String (code-point) order — the batch
    // max(struct) uses the latter, so the streaming tie-break must too
    val emoji = "😀"
    val bmp = "�"
    assert(emoji < bmp, "fixture must exercise the order divergence")
    val ms = MemoryStream[(Long, Long, Boolean, String)](s)
    val got = scala.collection.mutable.ArrayBuffer[
      (Long, Long, Option[String])]()
    val q = graft.streaming.EventStreams.asofEnrich(
        ms.toDF().toDF("key", "ts", "isRight", "payload"))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got += ((r.getLong(0), r.getLong(1),
          Option(if (r.isNullAt(2)) null else r.getString(2)))))
      }.start()
    try {
      ms.addData(Seq((1L, 5L, true, bmp), (1L, 5L, true, emoji),
        (1L, 6L, false, "L")))
      q.processAllAvailable()
    } finally q.stop()
    val batch = graft.ops.OrderedJoins.asofJoinBackward(
        Seq((1L, 6L, "L")).toDF("key", "lts", "lid"),
        Seq((1L, 5L, bmp), (1L, 5L, emoji)).toDF("key", "rts", "rpay"),
        Seq("key"), "lts", "rts")
      .collect().map(r => Option(r.getString(4))).toSeq
    assert(batch == Seq(Some(emoji)))
    assert(got.toList == List((1L, 6L, Some(emoji))))
  }

  test("asof enrichment survives null payloads and drops null side tags") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(Long, Long, String, String)](s)
    val got = scala.collection.mutable.ArrayBuffer[
      (Long, Long, Option[String])]()
    val q = graft.streaming.EventStreams.asofEnrich(
        ms.toDF().toDF("key", "ts", "isRight", "payload"))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got += ((r.getLong(0), r.getLong(1),
          Option(if (r.isNullAt(2)) null else r.getString(2)))))
      }.start()
    try {
      // null-payload right, then another; a null side tag is dropped;
      // two lefts read the state without crashing the query
      ms.addData(Seq((1L, 5L, "true", null), (1L, 6L, "true", "R6"),
        (1L, 7L, null, "ghost"), (1L, 8L, "false", "L8"),
        (2L, 3L, "true", null), (2L, 4L, "false", "L4")))
      q.processAllAvailable()
    } finally q.stop()
    val byKey = got.map(g => (g._1, g._2) -> g._3).toMap
    assert(byKey((1L, 8L)) === Some("R6")) // non-null beats null on merge
    assert(byKey((2L, 4L)) === None) // matched-null emits as no-match
    assert(got.size == 2) // the null-side row produced nothing
  }

  test("flatMapGroupsWithState milestones match the batch counts") {
    val s = init()
    val stream = EventStreams.readEventStream(s, "/root/testdata/sf0.001/events*")
    val q = EventStreams.userMilestones(stream, every = 50)
      .writeStream.outputMode("append")
      .format("memory").queryName("milestones_out").start()
    try {
      q.processAllAvailable()
      val got = s.table("milestones_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch oracle: user with n events crosses every multiple of 50 ≤ n
      val batch = TradeGraph.events(s, "/root/testdata/sf0.001")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().flatMap { r =>
          (1L to r.getLong(1) / 50).map(k => (r.getLong(0), k * 50))
        }.toSet
      assert(got == batch && got.nonEmpty)
    } finally q.stop()
  }

  test("sliding windows match a hand-computed batch equivalent") {
    val s = init()
    val stream = EventStreams.readEventStream(s, "/root/testdata/sf0.001/events*")
    val q = EventStreams.slidingUserActivity(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try {
      q.processAllAvailable()
      val got = s.table("sliding_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch oracle: every event contributes to the 5 one-minute-spaced
      // windows of length 5 min that contain it
      val want = EventStreams
        .readEventsBatch(s, "/root/testdata/sf0.001/events*")
        .withColumn("ms", expr("ts DIV 1000000"))
        .select(col("user_id"), col("ms")).collect()
        .flatMap { r =>
          val (uid, ms) = (r.getLong(0), r.getLong(1))
          val lastStart = ms - (ms % 60000L)
          (0 until 5).map(i => (lastStart - i * 60000L, uid))
        }
        .groupBy(identity).map { case ((w, u), a) =>
          (w, u, a.length.toLong) }.toSet
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch plan") {
    val s = init()
    val stream = EventStreams.readEventStream(s, "/root/testdata/sf0.001/events*")
    val q = EventStreams.eventFollowJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("follow_out").start()
    try {
      q.processAllAvailable()
      val got = s.table("follow_out")
        .select("user_id", "first_event", "then_event", "gap_ms").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch twin: the SAME operator over the static DataFrame (watermarks
      // are no-ops in batch) — one plan, two execution modes
      val batchEv = EventStreams
        .readEventsBatch(s, "/root/testdata/sf0.001/events*")
      val want = EventStreams.eventFollowJoin(batchEv)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("same-type follow join excludes self-pairs") {
    val s = init()
    val batchEv = EventStreams
      .readEventsBatch(s, "/root/testdata/sf0.001/events*")
    val pairs = EventStreams.eventFollowJoin(batchEv, "click", "click")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty && pairs.forall { case (a, b) => a != b })
    // antisymmetric: equal-time co-occurrences count once, not twice
    val set = pairs.toSet
    assert(pairs.forall { case (a, b) => !set.contains((b, a)) })
  }

  test("streaming session windows produce bounded sessions") {
    val s = init()
    val stream = EventStreams.readEventStream(s, "/root/testdata/sf0.001/events*")
    val q = EventStreams.sessionWindows(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val got = s.table("sessions_out")
      // session count per user must equal the batch sessionization
      val streamSessions = got.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = SparkEntry.queries("q30_sessionize")(
        s, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamSessions == batch)
    } finally q.stop()
  }

  test("streaming per-group HLL and CountMin converge to their batch " +
      "by-group twins (reordering; redelivery for the idempotent HLL)") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sk = graft.ops.Sketches
    val data = (1L to 400L).map(i => (if (i % 3 == 0) "a" else "b", i))
    val shuffled = data.sortBy { case (_, k) => k * 2654435761L % 101 }
    val third = (shuffled.length + 2) / 3
    val parts = shuffled.grouped(third).toSeq

    // HLL by group: idempotent max merge absorbs a redelivered slice
    val chunksH = Seq(parts(0), parts(1), parts(2) ++ parts(0).take(15))
    val msH = MemoryStream[(String, Long)](s)
    val regs =
      new scala.collection.concurrent.TrieMap[(String, Long), Long]()
    val qh = graft.streaming.CorpusStreams
      .hllRegistersByGroup(msH.toDF().toDF("g", "k"), "g", "k", b = 8)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          regs((r.getString(0), r.getLong(1))) = r.getLong(2))
      }.start()
    try {
      chunksH.foreach { c => msH.addData(c); qh.processAllAvailable() }
    } finally qh.stop()
    val batchRegs = sk.hllRegistersByGroup(
        data.toDF("g", "k"), "g", col("k"), b = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Number](2).longValue()).toMap
    assert(regs.nonEmpty && regs.toMap == batchRegs)

    // CountMin by group: exactly-once source rows (additive state),
    // reordered batches only
    val docs = (1L to 120L).map(i =>
      (if (i % 2 == 0) "x" else "y", s"tok${i % 7} tok${i % 11} common"))
    val dShuffled = docs.sortBy { case (_, t) => t.hashCode * 31 + 7 }
    val dParts = dShuffled.grouped((dShuffled.length + 2) / 3).toSeq
    val msC = MemoryStream[(String, String)](s)
    val counters =
      new scala.collection.concurrent.TrieMap[(String, Int, Long), Long]()
    val qc = graft.streaming.CorpusStreams
      .cmCountersByGroup(msC.toDF().toDF("g", "text"), "g", "text",
        depth = 4, width = 16)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          counters((r.getString(0), r.getInt(1), r.getLong(2))) =
            r.getLong(3))
      }.start()
    try {
      dParts.foreach { c => msC.addData(c); qc.processAllAvailable() }
    } finally qc.stop()
    val batchCm = sk.countMinSketchByGroup(
        docs.toDF("g", "text"), "g", "text", depth = 4, width = 16)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(counters.nonEmpty && counters.toMap == batchCm)
  }

  test("rangeJoinPoints and overlapJoin run UNCHANGED on a stream " +
      "against static intervals - stateless bucketized equi-joins, " +
      "batch parity in append mode") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val oj = graft.ops.OrderedJoins
    val intervals = Seq((0L, 9L, "low"), (10L, 99L, "mid"),
      (50L, 199L, "wide"), (300L, 200L, "empty"))
      .toDF("lo", "hi", "tag")
    // point stream vs static intervals
    val pts = (0L to 250L by 7L).map(p => (p, s"p$p"))
    val ms = MemoryStream[(Long, String)](s)
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val q = oj.rangeJoinPoints(ms.toDF().toDF("p", "name"), "p",
        intervals, "lo", "hi", bucketWidth = 16L)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(_.mkString("|")); ()
      }.start()
    try {
      pts.grouped(13).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val want = oj.rangeJoinPoints(pts.toDF("p", "name"), "p",
        intervals, "lo", "hi", bucketWidth = 16L)
      .collect().map(_.mkString("|"))
    assert(got.nonEmpty && got.sorted.toSeq === want.sorted.toSeq)

    // interval stream vs static intervals (exactly-once first-bucket
    // emission holds per micro-batch because it is a per-PAIR rule)
    val ivs = (0L to 200L by 11L).map(l => (l, l + 17L, s"i$l"))
    val ms2 = MemoryStream[(Long, Long, String)](s)
    val got2 = scala.collection.mutable.ArrayBuffer[String]()
    val q2 = oj.overlapJoin(ms2.toDF().toDF("alo", "ahi", "aname"),
        "alo", "ahi", intervals, "lo", "hi", bucketWidth = 16L)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= df.collect().map(_.mkString("|")); ()
      }.start()
    try {
      ivs.grouped(7).foreach { c =>
        ms2.addData(c); q2.processAllAvailable()
      }
    } finally q2.stop()
    val want2 = oj.overlapJoin(ivs.toDF("alo", "ahi", "aname"),
        "alo", "ahi", intervals, "lo", "hi", bucketWidth = 16L)
      .collect().map(_.mkString("|"))
    assert(got2.nonEmpty && got2.sorted.toSeq === want2.sorted.toSeq)
  }

  test("streaming ANN search over a prebuilt IVF index matches batch " +
      "searchIvf under chunking and redelivery") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.Row
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.ops.Similarity.buildIvfIndex(emb, numCentroids = 8)
    try {
      val queries = emb.filter(col("vec_id") < 12)
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      // three chunks + a re-delivery of part of chunk 1 in chunk 3: the
      // keyed top-k state must merge idempotently
      val parts = queries.grouped((queries.length + 2) / 3).toSeq
      val chunks = Seq(parts(0), parts(1),
        parts.drop(2).flatten.toArray ++ parts(0).take(2))
      val ms = MemoryStream[(Long, Seq[Double])](s)
      val latest =
        new scala.collection.concurrent.TrieMap[Long, Set[(Long, Long, Double)]]()
      val q = graft.streaming.CorpusStreams.searchIvf(index,
          ms.toDF().toDF("vec_id", "embedding"), k = 5, nprobe = 3)
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
            latest(qid) = rows.map((r: Row) =>
              (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
          }
        }.start()
      try {
        chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
      } finally q.stop()
      val batch = graft.ops.Similarity.searchIvf(index,
          emb.filter(col("vec_id") < 12), k = 5, nprobe = 3)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (qid, rows) => qid -> rows.map(r =>
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet }
      assert(latest.nonEmpty && latest.keySet == batch.keySet)
      batch.foreach { case (qid, want) =>
        assert(latest(qid) == want, s"query $qid diverged from batch")
      }
    } finally index.release()
  }

  test("streaming ANN search over a prebuilt IVF-PQ index matches batch " +
      "searchIvfPq under chunking and redelivery") {
    val s = init()
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.Row
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = graft.ops.Similarity.buildIvfPqIndex(emb,
      numCentroids = 8, m = 2, ksub = 8, coarseIters = 1, pqIters = 1)
    try {
      val queries = emb.filter(col("vec_id") < 12)
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val parts = queries.grouped((queries.length + 2) / 3).toSeq
      val chunks = Seq(parts(0), parts(1),
        parts.drop(2).flatten.toArray ++ parts(0).take(2))
      val ms = MemoryStream[(Long, Seq[Double])](s)
      val latest =
        new scala.collection.concurrent.TrieMap[Long, Set[(Long, Long, Double)]]()
      val q = graft.streaming.CorpusStreams.searchIvfPq(index,
          ms.toDF().toDF("vec_id", "embedding"), k = 5, nprobe = 3)
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
            latest(qid) = rows.map((r: Row) =>
              (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
          }
        }.start()
      try {
        chunks.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
      } finally q.stop()
      val batch = graft.ops.Similarity.searchIvfPq(index,
          emb.filter(col("vec_id") < 12), k = 5, nprobe = 3)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (qid, rows) => qid -> rows.map(r =>
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet }
      assert(latest.nonEmpty && latest.keySet == batch.keySet)
      batch.foreach { case (qid, want) =>
        assert(latest(qid) == want, s"query $qid diverged from batch")
      }
    } finally index.release()
  }
}
