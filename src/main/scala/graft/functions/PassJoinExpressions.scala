package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** PassJoin blocking keys for exact edit-distance joins (Li, Deng, Feng,
  * ICDE 2011 "PASS-JOIN: a partition-based method for similarity joins").
  *
  * A string of length L splits into d+1 contiguous segments; if
  * ed(s, t) ≤ d then at least one segment of s is untouched by any edit
  * (d edits cannot modify d+1 segments — insertions only shift) and its
  * exact copy appears in t at a start position shifted by at most d.
  * So indexing each string's d+1 segments keyed (L, segIdx, content) and
  * probing each string's substrings at the shifted positions for every
  * candidate source length L ∈ [|t|−d, |t|+d] finds EVERY true pair —
  * blocking with zero false negatives, candidates ≪ n².
  *
  * Both generators are fused codegen expressions (the WordShingles
  * pattern): a declarative nested `transform(sequence(...))` chain would
  * re-evaluate its outer bindings per element (the round-6 q73 lesson).
  * All offsets are CODE-POINT indices (`UTF8String.substring` walks code
  * points), matching Spark's code-point `levenshtein`. NOTE: DuckDB's
  * `levenshtein` is BYTE-based — `levenshtein('héllo','hello')` is 2
  * there, 1 here — so a cross-engine oracle over this operator must
  * restrict to ASCII (or byte-identical) strings, as q102 does
  * explicitly.
  */
object PassJoinKeys {
  /** Segment geometry: the first (L mod k) of k segments get the extra
    * char. Any fixed convention works; index and probe must agree. */
  @inline private[graft] def segLen(l: Int, k: Int, i: Int): Int =
    l / k + (if (i < l % k) 1 else 0)
  @inline private[graft] def segStart(l: Int, k: Int, i: Int): Int =
    i * (l / k) + math.min(i, l % k)

  val keyType: DataType = ArrayType(StructType(Seq(
    StructField("l", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("seg", StringType, nullable = false))), containsNull = false)

  /** Index side: the d+1 segments of s, keyed (|s|, i, content).
    *
    * Short-string rule: when |s| ≤ d the split would produce
    * zero-length segments, and an empty segment key (L, i, "") collides
    * with every compatible-length string — candidate generation
    * degenerates toward all-pairs on short-key corpora. The pigeonhole
    * guarantee also genuinely needs them (d edits can touch all |s|
    * non-empty length-1 segments), so dropping empties alone would lose
    * matches. Instead such strings emit ONE length-only key
    * (|s|, -1, "") and the probe side emits the matching key for every
    * candidate length ≤ d — exact (any t within distance d has
    * compatible length; the levenshtein verify prunes), and the
    * candidate set is all (short s, length-compatible t) pairs, which
    * is what the problem inherently costs for strings this short. */
  def segments(s: UTF8String, d: Int): GenericArrayData = {
    val l = s.numChars(); val k = d + 1
    if (l <= d) {
      return new GenericArrayData(Array[Any](
        new GenericInternalRow(Array[Any](
          l, -1, UTF8String.EMPTY_UTF8))))
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val st = segStart(l, k, i)
      out(i) = new GenericInternalRow(Array[Any](
        l, i, s.substring(st, st + segLen(l, k, i))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Probe side: for every candidate source length L ∈ [|t|−d, |t|+d]
    * and segment index i, the substrings of t with (L, i)'s segment
    * length at start positions within ±d of (L, i)'s segment start —
    * deduplicated per (L, i) (repetitive strings repeat content across
    * shifts). ≤ (2d+1)²·(d+1) entries per row. */
  def probes(t: UTF8String, d: Int): GenericArrayData = {
    val m = t.numChars(); val k = d + 1
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    val seen = new java.util.HashSet[UTF8String]()
    var l = math.max(0, m - d)
    while (l <= m + d) {
      if (l <= d) {
        // short-index rule (see [[segments]]): one length-only key per
        // candidate short length — never a zero-length content key
        buf += new GenericInternalRow(Array[Any](
          l, -1, UTF8String.EMPTY_UTF8))
      } else {
        var i = 0
        while (i < k) {
          val len = segLen(l, k, i); val st = segStart(l, k, i)
          if (len <= m) {
            seen.clear()
            var p = math.max(0, st - d)
            val pMax = math.min(m - len, st + d)
            while (p <= pMax) {
              val sub = t.substring(p, p + len)
              if (seen.add(sub))
                buf += new GenericInternalRow(Array[Any](l, i, sub))
              p += 1
            }
          }
          i += 1
        }
      }
      l += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

/** `array<struct<l,i,seg>>` of the d+1 indexed segments of the input. */
case class PassJoinSegments(child: Expression, d: Int)
    extends UnaryExpression {
  require(d >= 1 && d <= 8, "edit-distance threshold must be in [1, 8]")
  override def dataType: DataType = PassJoinKeys.keyType
  override def prettyName: String = "passjoin_segments"
  override def nullSafeEval(a: Any): Any =
    PassJoinKeys.segments(a.asInstanceOf[UTF8String], d)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PassJoinKeys.segments($x, $d);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `array<struct<l,i,seg>>` of the shifted probe substrings of the input. */
case class PassJoinProbes(child: Expression, d: Int)
    extends UnaryExpression {
  require(d >= 1 && d <= 8, "edit-distance threshold must be in [1, 8]")
  override def dataType: DataType = PassJoinKeys.keyType
  override def prettyName: String = "passjoin_probes"
  override def nullSafeEval(a: Any): Any =
    PassJoinKeys.probes(a.asInstanceOf[UTF8String], d)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PassJoinKeys.probes($x, $d);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PassJoinFunctions {
  def passjoin_segments(s: Column, d: Int): Column =
    Bridge.column(PassJoinSegments(Bridge.expression(s), d))
  def passjoin_probes(s: Column, d: Int): Column =
    Bridge.column(PassJoinProbes(Bridge.expression(s), d))
}
