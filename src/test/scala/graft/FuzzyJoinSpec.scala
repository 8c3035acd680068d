package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PassJoinKeys
import graft.ops.Dedup

/** PassJoin edit-distance join: zero-false-negative parity against the
  * brute-force quadratic join on adversarial fixtures (insertions,
  * deletions, multi-byte code points, repetitive strings, empties). */
class FuzzyJoinSpec extends AnyFunSuite {
  import Fixture.init

  private def brute(s: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    import s.implicits._
    val df = rows.toDF("id", "str")
    df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.str"), col("b.str")))
      .filter(col("dist") <= d)
      .select(col("a.id"), col("b.id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def fast(s: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    import s.implicits._
    Dedup.editDistancePairs(rows.toDF("id", "str"), "id", "str", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("segment geometry covers the string exactly") {
    for (l <- 0 to 23; d <- 1 to 3) {
      val k = d + 1
      val lens = (0 until k).map(i => PassJoinKeys.segLen(l, k, i))
      val starts = (0 until k).map(i => PassJoinKeys.segStart(l, k, i))
      assert(lens.sum === l, s"l=$l d=$d")
      assert(starts === lens.scanLeft(0)(_ + _).init, s"l=$l d=$d")
    }
  }

  test("probes contain every segment of every string within distance d") {
    // direct lemma check: for ed(s,t) <= d, some indexed segment of s
    // must appear among t's probes with the same (L, i) key
    val strs = Seq("kitten", "sitting", "kitte", "kittenn", "mitten",
      "flaw", "lawn", "", "a", "ab")
    val d = 2
    for (a <- strs; b <- strs) {
      val dist = editDistance(a, b)
      if (dist <= d) {
        val segs = keyset(PassJoinKeys.segments(UTF8String.fromString(a), d))
        val prbs = keyset(PassJoinKeys.probes(UTF8String.fromString(b), d))
        assert(segs.intersect(prbs).nonEmpty, s"'$a' vs '$b' (dist $dist)")
      }
    }
  }

  private def keyset(arr: org.apache.spark.sql.catalyst.util.GenericArrayData)
      : Set[(Int, Int, String)] =
    (0 until arr.numElements()).map { j =>
      val r = arr.getStruct(j, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }.toSet

  private def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("hand fixture: substitutions, indels, multi-byte, repeats, empties") {
    val s = init()
    val rows = Seq[(Long, String)](
      1L -> "hello world", 2L -> "hallo world", 3L -> "hello worlds",
      4L -> "héllo world", 5L -> "hello", 6L -> "", 7L -> "x",
      8L -> "aaaaaa", 9L -> "aaaaa", 10L -> "aabaaa",
      11L -> "totally different string")
    for (d <- 1 to 3)
      assert(fast(s, rows, d) === brute(s, rows, d), s"d=$d")
  }

  test("pseudo-random corpus parity (mixed lengths, shared vocabulary)") {
    val s = init()
    val vocab = Array("red", "blue", "small", "ring", "bolt", "widget")
    val rows = (0 until 160).map { i =>
      val n = 1 + (i * 7) % 4
      val words = (0 until n).map(j => vocab((i * 31 + j * 17) % vocab.length))
      val base = words.mkString(" ")
      // perturb a third of them: drop a char / swap a char / append
      val str = (i % 3, i % 5) match {
        case (0, p) if base.nonEmpty => base.patch(p % base.length, "", 1)
        case (1, p) if base.nonEmpty =>
          base.updated(p % base.length, ('a' + p).toChar)
        case _ => base + "z"
      }
      (i.toLong, str)
    }
    for (d <- 1 to 2)
      assert(fast(s, rows, d) === brute(s, rows, d), s"d=$d")
  }

  test("short strings (|s| <= d) take the length-only key: no empty " +
      "segment-content keys, parity preserved") {
    val s = init()
    // a corpus dominated by strings at or below d: the old zero-length
    // segment keys would have bucketed ALL of these together
    val rows = Seq[(Long, String)](
      1L -> "", 2L -> "a", 3L -> "b", 4L -> "ab", 5L -> "ba",
      6L -> "abc", 7L -> "xy", 8L -> "x", 9L -> "abcd", 10L -> "zz",
      11L -> "az", 12L -> "qrs")
    for (d <- 1 to 3)
      assert(fast(s, rows, d) === brute(s, rows, d), s"d=$d")
    // generator contract: zero-length CONTENT keys never carry a real
    // segment index — short strings emit only the (L, -1, "") marker
    for (str <- rows.map(_._2); d <- 1 to 3) {
      val u = UTF8String.fromString(str)
      for (k <- keyset(PassJoinKeys.segments(u, d))
          ++ keyset(PassJoinKeys.probes(u, d)))
        assert(k._3.nonEmpty || k._2 == -1, s"'$str' d=$d emitted $k")
      if (str.length <= d)
        assert(keyset(PassJoinKeys.segments(u, d)) ===
          Set((str.length, -1, "")), s"'$str' d=$d")
    }
  }

  test("null strings drop out; duplicate strings pair at distance 0") {
    val s = init()
    import s.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, null))
      .toDF("id", "str")
    val out = Dedup.editDistancePairs(df, "id", "str", 1).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet ===
      Set((1L, 2L, 0)))
  }
}
