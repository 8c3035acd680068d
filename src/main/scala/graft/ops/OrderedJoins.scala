package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ordered joins Spark has no built-in operator for — as-of (point-in-
  * time) and point-in-interval range joins — expressed as single-shuffle
  * declarative plans instead of the inequality-join nested loop Spark
  * would otherwise plan.
  *
  * Both exist because a naive formulation dies at scale:
  *  - `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + per-pair max is a per-key
  *    cross product (a key with n left × m right rows materializes n·m
  *    candidates before the argmax prunes them);
  *  - `p JOIN i ON p.x BETWEEN i.lo AND i.hi` with no equi key is a
  *    broadcast-nested-loop over the full corpus.
  */
object OrderedJoins {

  /** As-of backward join: each left row is matched with the single most
    * recent right row whose `rightTs` ≤ `leftTs`, per `keys` (DuckDB
    * `ASOF LEFT JOIN … ON l.k = r.k AND l.ts >= r.ts` semantics —
    * equal-timestamp right rows DO match). Unmatched left rows are kept
    * with null right columns (left-join semantics), as are rows whose
    * only match is older than `tolerance` time units.
    *
    * Plan: tag both sides, union, ONE hash shuffle on `keys`, and an
    * in-partition sort by (ts, side) with right-before-left on ties; a
    * running `last(right_struct, ignoreNulls)` window carries the latest
    * right row forward to every later left row. Each input row moves
    * exactly once and no candidate pair is ever materialized — the same
    * cost shape as a groupBy at 100 TB. Rows that tie on (keys, rightTs)
    * resolve to the max right struct (deterministic); pre-deduplicate the
    * right side per (keys, ts) if a different winner is wanted.
    *
    * Both ts columns must be numeric (cast to long internally; the
    * events queries use exact ms longs). Right-side non-key column names
    * must not collide with left columns.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, tolerance, forward = false)

  /** Forward as-of join: the single EARLIEST right row with `rightTs` ≥
    * `leftTs` per key (DuckDB `ASOF LEFT JOIN … ON l.ts <= r.ts`) — the
    * "next event after" lookup. Same union-window plan as
    * [[asofJoinBackward]] with the scan direction reversed; `tolerance`
    * bounds `rightTs - leftTs`. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, tolerance, forward = true)

  private def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    val rPayload = right.columns.filterNot(keys.contains)
    val clash = rPayload.intersect(left.columns)
    require(clash.isEmpty,
      s"asofJoinBackward: right columns ${clash.mkString(", ")} collide with left")
    require(rPayload.contains(rightTs) && left.columns.contains(leftTs),
      "asofJoinBackward: ts columns must exist (rightTs outside keys)")

    // forward scans are the mirrored backward scan: negate the ordering
    // timestamp so "latest ≤ ts" becomes "earliest ≥ ts"
    val sign = if (forward) -1L else 1L
    // a null-ts right row can never satisfy the ASOF inequality (DuckDB:
    // `l.ts >= r.ts` is never true on null) — without this filter it
    // sorts nulls-first and becomes everyone's "earliest" match whenever
    // no real one exists and tolerance is None
    val rNonNull = right.filter(col(rightTs).isNotNull)
    val rTagged = rNonNull.select(
      keys.map(col) ++ Seq(
        (col(rightTs).cast(LongType) * sign).as("__ats"), lit(0).as("__aside"),
        struct(rPayload.map(col): _*).as("__amatch")): _*)
    val rType = rTagged.schema("__amatch").dataType
    val lTagged = left.select(
      left.columns.map(col) ++ Seq(
        (col(leftTs).cast(LongType) * sign).as("__ats"), lit(1).as("__aside"),
        lit(null).cast(rType).as("__amatch")): _*)

    // right rows contribute only (keys, ts, struct); missing left columns
    // fill with null and are filtered out with the side tag
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").asc, col("__aside").asc, col("__amatch").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__amatch"), ignoreNulls = true).over(w))
      .filter(col("__aside") === 1)

    val inTol = tolerance match {
      case Some(tol) => col("__m").isNotNull &&
        col("__ats") - col("__m").getField(rightTs).cast(LongType) * sign <=
          lit(tol)
      case None => col("__m").isNotNull
    }
    matched.select(
      left.columns.map(col) ++ rPayload.map(c =>
        when(inTol, col("__m").getField(c)).as(c)): _*)
  }

  /** As-of join where BOTH sides are rows of ONE frame — the
    * clickstream shape (`purchases` matched to the same log's `clicks`).
    * [[asofJoinBackward]] on two filters of one table scans it twice and
    * pre-shuffles the right side; this variant is ONE scan, ONE shuffle
    * on `keys`, one in-partition sort — rows where `isRight` holds are
    * the match candidates, every other row is a left row carried to the
    * output with the matched payload appended.
    *
    * `rightPayload` maps right-side source columns to output names
    * (left and right read the same physical columns, so output names
    * must differ from `rows`' own). Ties on (keys, ts): the match is the
    * payload-struct maximum, same contract as the two-sided operator —
    * which also means a right side needing "max payload per (key, ts)"
    * dedup (q100's max(event_id) per click instant) gets it for free.
    * Null-ts right rows never match; null-ts left rows match nothing.
    *
    * @return left rows (all original columns) + one output column per
    *         rightPayload entry (null when no admissible match)
    */
  def asofSelfJoinBackward(rows: DataFrame, keys: Seq[String],
      tsCol: String, isRight: Column,
      rightPayload: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame =
    asofSelfJoin(rows, keys, tsCol, isRight, rightPayload, tolerance,
      forward = false)

  /** Forward twin of [[asofSelfJoinBackward]]: earliest right row with
    * ts ≥ the left row's, per key. */
  def asofSelfJoinForward(rows: DataFrame, keys: Seq[String],
      tsCol: String, isRight: Column,
      rightPayload: Seq[(String, String)],
      tolerance: Option[Long] = None): DataFrame =
    asofSelfJoin(rows, keys, tsCol, isRight, rightPayload, tolerance,
      forward = true)

  private def asofSelfJoin(rows: DataFrame, keys: Seq[String],
      tsCol: String, isRight: Column,
      rightPayload: Seq[(String, String)],
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    require(rightPayload.nonEmpty, "asofSelfJoin: rightPayload is empty")
    val clash = rightPayload.map(_._2).intersect(rows.columns.toSeq)
    require(clash.isEmpty,
      s"asofSelfJoin: output names ${clash.mkString(", ")} collide with input")
    val reserved = Seq("__ats", "__aside", "__amatch", "__m", "__mts")
      .filter(rows.columns.contains)
    require(reserved.isEmpty,
      s"asofSelfJoin: input columns ${reserved.mkString(", ")} are reserved")
    val sign = if (forward) -1L else 1L
    val ats = (col(tsCol).cast(LongType) * sign).as("__ats")
    // right rows: null ts can never satisfy the inequality (same rule as
    // the two-sided operator); left rows with null ts sort first and see
    // no preceding right row, i.e. match nothing
    val side = when(isRight, lit(0)).otherwise(lit(1)).as("__aside")
    val matchStruct = when(isRight && col(tsCol).isNotNull,
      struct((col(tsCol).cast(LongType) * sign).as("__mts") +:
        rightPayload.map { case (src, out) => col(src).as(out) }: _*))
      .as("__amatch")
    val tagged = rows.select(
      rows.columns.map(col) ++ Seq(ats, side, matchStruct): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").asc, col("__aside").asc, col("__amatch").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = tagged
      .withColumn("__m", last(col("__amatch"), ignoreNulls = true).over(w))
      .filter(col("__aside") === 1)
    val inTol = tolerance match {
      case Some(tol) => col("__m").isNotNull &&
        col("__ats") - col("__m").getField("__mts") <= lit(tol)
      case None => col("__m").isNotNull
    }
    matched.select(
      rows.columns.map(col) ++ rightPayload.map { case (_, out) =>
        when(inTol, col("__m").getField(out)).as(out) }: _*)
  }

  /** Point-in-interval join with NO equi key, bucketized: intervals
    * explode to the fixed-width buckets they cover, points hash to their
    * single bucket, and the join becomes an equi-join on the bucket with
    * the exact range predicate as a residual. Each (interval, point) pair
    * appears exactly once — a point lives in one bucket — so no dedup
    * pass is needed.
    *
    * `bucketWidth` trades explosion (intervals spanning many buckets)
    * against bucket density; pick it near the typical interval length.
    * Coordinates must be non-negative (integer `DIV` truncates toward
    * zero, so negative coordinates would misalign buckets). Intervals
    * with lo > hi match nothing and are dropped. A bucket shared by many
    * intervals AND many points concentrates work like any hot join key;
    * at corpus scale route such skew through
    * [[Dedup.blockedBucketJoin]]-style splitting or shrink the width.
    *
    * STREAMING: because the plan is a stateless bucketized equi-join,
    * the same function runs unchanged with a STREAMING points side
    * against a static interval table (append mode, stream-static
    * join) — spec-pinned batch parity in SnapshotAndStreamingSpec;
    * [[overlapJoin]] likewise with a streaming interval side (its
    * first-shared-bucket exactly-once rule is per PAIR, so it holds
    * within and across micro-batches).
    */
  def rangeJoinPoints(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "rangeJoinPoints: bucketWidth must be positive")
    val clash = points.columns.intersect(intervals.columns)
    require(clash.isEmpty,
      s"rangeJoinPoints: shared column names ${clash.mkString(", ")}")
    val ivals = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bk", explode(expr(
        s"sequence(`$loCol` DIV ${bucketWidth}L, `$hiCol` DIV ${bucketWidth}L)")))
    val pts = points.withColumn("__bk",
      expr(s"`$pointCol` DIV ${bucketWidth}L"))
    pts.join(ivals, Seq("__bk"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bk")
  }

  /** Interval × interval OVERLAP join with no equi key, bucketized: both
    * sides explode to the fixed-width buckets they cover and pairs meet
    * on the shared bucket. An overlapping pair shares every bucket of the
    * overlap region, so it is emitted ONLY in the first bucket both
    * cover (`bucket == max(loA, loB) DIV width`) — exactly-once without a
    * distinct pass. Same caveats as [[rangeJoinPoints]]: non-negative
    * closed intervals, empty (lo > hi) rows dropped, width chosen near
    * the typical interval length. */
  def overlapJoin(a: DataFrame, loA: String, hiA: String,
      b: DataFrame, loB: String, hiB: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "overlapJoin: bucketWidth must be positive")
    val clash = a.columns.intersect(b.columns)
    require(clash.isEmpty,
      s"overlapJoin: shared column names ${clash.mkString(", ")}")
    def buckets(df: DataFrame, lo: String, hi: String, bk: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn(bk, explode(expr(
        s"sequence(`$lo` DIV ${bucketWidth}L, `$hi` DIV ${bucketWidth}L)")))
    val ea = buckets(a, loA, hiA, "__bka")
    val eb = buckets(b, loB, hiB, "__bkb")
    ea.join(eb, col("__bka") === col("__bkb") &&
        col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        col("__bka") === expr(
          s"greatest(`$loA` DIV ${bucketWidth}L, `$loB` DIV ${bucketWidth}L)"))
      .drop("__bka", "__bkb")
  }
}
