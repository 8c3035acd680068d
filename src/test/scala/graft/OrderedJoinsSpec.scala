package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.OrderedJoins

/** As-of and bucketized range joins: hand goldens for the boundary
  * semantics, plus parity against the naive (quadratic) formulation on
  * a pseudo-random fixture — the independent-path check. */
class OrderedJoinsSpec extends AnyFunSuite {
  import Fixture.init

  private def leftDf(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 100L, "d"),
      (3L, 7L, "e"))
      .toDF("k", "lts", "ltag")
  }

  private def rightDf(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    // key 1: rows at 4, 10 (equal-ts with left "a"), 15; key 2: only at
    // 99; key 3: nothing
    Seq((1L, 4L, "r4"), (1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 99L, "r99"))
      .toDF("k", "rts", "rtag")
  }

  test("asof backward: equal-ts right row matches; no-match keeps left row") {
    val s = init()
    val out = OrderedJoins.asofJoinBackward(
        leftDf(s), rightDf(s), Seq("k"), "lts", "rts")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out === Map(
      "a" -> Some("r10"), // lts=10 matches rts=10 (>= is inclusive)
      "b" -> Some("r15"), // latest of 4/10/15 under 20
      "c" -> Some("r4"),
      "d" -> Some("r99"),
      "e" -> None)) // key 3 has no right rows; left row survives
  }

  test("asof tolerance nulls an out-of-window match instead of falling back") {
    val s = init()
    val out = OrderedJoins.asofJoinBackward(
        leftDf(s), rightDf(s), Seq("k"), "lts", "rts", tolerance = Some(2L))
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // "b" at 20: nearest is 15 (gap 5 > 2) — must be null, NOT r10/r4
    assert(out("b") === None)
    assert(out("a") === Some("r10")) // gap 0
    assert(out("c") === Some("r4")) // gap 1
  }

  test("asof right ties on (key, ts) resolve to the max struct, deterministically") {
    val s = init()
    import s.implicits._
    val l = Seq((1L, 10L)).toDF("k", "lts")
    val r = Seq((1L, 10L, "x"), (1L, 10L, "z"), (1L, 10L, "y"))
      .toDF("k", "rts", "rtag")
    val out = OrderedJoins.asofJoinBackward(l, r, Seq("k"), "lts", "rts")
      .select("rtag").collect().map(_.getString(0)).toSeq
    assert(out === Seq("z"))
  }

  test("asof parity vs the naive per-pair argmax on a pseudo-random fixture") {
    val s = init()
    import s.implicits._
    // deterministic "random": hash-scatter 400 left / 300 right rows over
    // 17 keys and a small ts range so ties and empty keys both occur
    val l = (0 until 400).map { i =>
      (math.abs((i * 2654435761L) % 17), (i * 48271L) % 50, i.toLong)
    }.toDF("k", "lts", "lid")
    val r = (0 until 300).map { i =>
      (math.abs((i * 97178899L) % 17), (i * 16807L) % 50, i.toLong)
    }.toDF("k", "rts", "rid")
    val fast = OrderedJoins.asofJoinBackward(l, r, Seq("k"), "lts", "rts",
        tolerance = Some(7L))
      .select("lid", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // naive: all candidate pairs, max (rts, rid) struct per left row
    val naive = l.join(r, Seq("k"), "left")
      .withColumn("ok", col("rts").isNotNull &&
        col("rts") <= col("lts") && col("lts") - col("rts") <= 7)
      .groupBy("lid")
      .agg(max(when(col("ok"), struct(col("rts"), col("rid")))).as("m"))
      .select(col("lid"), coalesce(col("m.rid"), lit(-1L)).as("rid"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(fast === naive)
  }

  test("asof: a null-ts right row never matches (DuckDB `l.ts >= r.ts` " +
      "semantics), in both directions and without tolerance") {
    val s = init()
    import s.implicits._
    val l = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("k", "lts", "ltag")
    // key 1 has ONLY a null-ts right row; key 2 has a real one too
    val r = Seq((1L, Option.empty[Long], "nul1"), (2L, Option(3L), "r3"),
      (2L, Option.empty[Long], "nul2")).toDF("k", "rts", "rtag")
    val back = OrderedJoins.asofJoinBackward(l, r, Seq("k"), "lts", "rts")
      .select("ltag", "rtag").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(back === Map("a" -> None, "b" -> Some("r3")))
    val fwd = OrderedJoins.asofJoinForward(l, r, Seq("k"), "lts", "rts")
      .select("ltag", "rtag").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(fwd === Map("a" -> None, "b" -> None))
  }

  test("asof rejects right/left column collisions") {
    val s = init()
    import s.implicits._
    val l = Seq((1L, 1L, "v")).toDF("k", "lts", "shared")
    val r = Seq((1L, 1L, "v")).toDF("k", "rts", "shared")
    val e = intercept[IllegalArgumentException] {
      OrderedJoins.asofJoinBackward(l, r, Seq("k"), "lts", "rts")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("range join: inclusive bounds, multi-bucket intervals, empty intervals dropped") {
    val s = init()
    import s.implicits._
    val pts = Seq((1L, 0L), (2L, 10L), (3L, 25L), (4L, 39L), (5L, 40L),
      (6L, 100L)).toDF("pid", "x")
    val ivals = Seq((10L, 10L, 40L), (20L, 0L, 5L), (30L, 50L, 45L))
      .toDF("iid", "lo", "hi") // iid 30 is empty (lo > hi) — dropped
    val out = OrderedJoins.rangeJoinPoints(pts, "x", ivals, "lo", "hi",
        bucketWidth = 7L)
      .select("iid", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L),
      (20L, 1L)))
  }

  test("asof forward: earliest following right row; equal-ts inclusive; " +
      "parity vs the naive per-pair argmin") {
    val s = init()
    import s.implicits._
    val out = OrderedJoins.asofJoinForward(
        leftDf(s), rightDf(s), Seq("k"), "lts", "rts")
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out === Map(
      "a" -> Some("r10"), // equal ts matches forward too
      "b" -> None, // nothing at or after 20
      "c" -> Some("r10"), // earliest of 10/15 after 5... r10
      "d" -> None, // 100 > 99
      "e" -> None))
    // naive parity with tolerance on pseudo-random data
    val l = (0 until 300).map { i =>
      (math.abs((i * 2654435761L) % 13), (i * 48271L) % 40, i.toLong)
    }.toDF("k", "lts", "lid")
    val r = (0 until 250).map { i =>
      (math.abs((i * 97178899L) % 13), (i * 16807L) % 40, i.toLong)
    }.toDF("k", "rts", "rid")
    val fast = OrderedJoins.asofJoinForward(l, r, Seq("k"), "lts", "rts",
        tolerance = Some(5L))
      .select("lid", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // naive: min (rts, -rid) struct per left row → earliest ts, then the
    // engine's max-struct tie winner (max rid at the chosen ts)
    val naive = l.join(r, Seq("k"), "left")
      .withColumn("ok", col("rts").isNotNull &&
        col("rts") >= col("lts") && col("rts") - col("lts") <= 5)
      .groupBy("lid")
      .agg(min(when(col("ok"), struct(col("rts"), (-col("rid")).as("nr"))))
        .as("m"))
      .select(col("lid"), coalesce(-col("m.nr"), lit(-1L)).as("rid"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(fast === naive)
  }

  test("overlap join: exactly-once pairs across widths, parity vs the " +
      "naive overlap product") {
    val s = init()
    import s.implicits._
    val a = (0 until 120).map { i =>
      val lo = (i * 16807L) % 900
      (i.toLong, lo, lo + (i * 13L) % 150)
    }.toDF("aid", "alo", "ahi")
    val b = (0 until 90).map { i =>
      val lo = (i * 48271L) % 900
      (i.toLong, lo, lo + (i * 7L) % 100)
    }.toDF("bid", "blo", "bhi")
    val naive = a.join(b, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (width <- Seq(1L, 16L, 128L, 4000L)) {
      val fast = OrderedJoins.overlapJoin(a, "alo", "ahi", b, "blo", "bhi",
          bucketWidth = width)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fast.sorted === naive.sorted, s"width=$width")
      assert(fast.size === fast.toSet.size, s"duplicates at width=$width")
    }
  }

  test("range join parity vs plain inequality join; pairs appear exactly once") {
    val s = init()
    import s.implicits._
    val pts = (0 until 500).map(i => (i.toLong, (i * 48271L) % 1000))
      .toDF("pid", "x")
    val ivals = (0 until 80).map { i =>
      val lo = (i * 16807L) % 950
      (i.toLong, lo, lo + (i * 7L) % 120)
    }.toDF("iid", "lo", "hi")
    for (width <- Seq(1L, 13L, 64L, 5000L)) {
      val fast = OrderedJoins.rangeJoinPoints(pts, "x", ivals, "lo", "hi",
          bucketWidth = width)
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val naive = pts.join(ivals,
          col("x") >= col("lo") && col("x") <= col("hi"))
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fast.sorted === naive.sorted, s"width=$width")
      assert(fast.size === fast.toSet.size, s"duplicate pairs at width=$width")
    }
  }

  test("self as-of join matches the two-sided operator on split sides, " +
      "both directions, with ties, null ts and tolerance") {
    val s = init()
    import s.implicits._
    // one event log: (key, ts, kind, payload) with equal-ts collisions
    // inside and across sides, a null-ts right row (never matches) and a
    // null-ts left row (matches nothing)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(7).toLong,
        if (rnd.nextInt(50) == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextInt(40).toLong),
        if (rnd.nextBoolean()) "R" else "L", i.toLong)
    }.toDF("k", "ts", "kind", "pid")
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(5L))) {
      val self =
        (if (fwd) OrderedJoins.asofSelfJoinForward _
         else OrderedJoins.asofSelfJoinBackward _)
          .apply(rows, Seq("k"), "ts", col("kind") === "R",
            Seq("ts" -> "mts", "pid" -> "mpid"), tol)
          .filter(col("kind") === "L")
          .select("pid", "mts", "mpid").collect()
          .map(r => r.getLong(0) ->
            ((Option(r.get(1)), Option(r.get(2))))).toMap
      // two-sided reference: the right side pre-deduped to the max
      // payload struct per (k, ts) — the self variant's tie contract
      val l = rows.filter(col("kind") === "L")
        .select(col("k"), col("ts").as("lts"), col("pid"))
      val r = rows.filter(col("kind") === "R")
        .groupBy(col("k"), col("ts").as("rts"))
        .agg(max(struct(col("ts").as("mts"), col("pid").as("mpid")))
          .as("m"))
        .select(col("k"), col("rts"), col("m.mts").as("mts"),
          col("m.mpid").as("mpid"))
      val twoSided =
        (if (fwd) OrderedJoins.asofJoinForward _
         else OrderedJoins.asofJoinBackward _)
          .apply(l, r, Seq("k"), "lts", "rts", tol)
          .select("pid", "mts", "mpid").collect()
          .map(x => x.getLong(0) ->
            ((Option(x.get(1)), Option(x.get(2))))).toMap
      assert(self === twoSided, s"fwd=$fwd tol=$tol")
      assert(self.values.exists(_._1.isDefined) &&
        self.values.exists(_._1.isEmpty), s"fixture degenerate fwd=$fwd")
    }
  }
}
