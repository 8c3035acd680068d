package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Gopher repetition signals in one pass:
  * `struct(n_lines, dup_line_frac, dup_line_char_frac, dup_5gram_frac,
  * top_2gram_char_frac)`.
  *
  * Every metric is PER DOCUMENT, so even the most-frequent-2-gram — which
  * the declarative form computed with an `explode` + two corpus-wide
  * aggregations — reduces to a per-row hash count: the operator becomes
  * exchange-FREE. Semantics match the declarative form exactly:
  *  - lines: `\r?\n` splits, space-trimmed, empties dropped;
  *  - dup fractions: `1 − distinct/total` (0 when empty); char variants
  *    weight by line CHARACTER counts (code points);
  *  - 5-gram fraction over space-joined lowercase word 5-grams (0 when
  *    the document has fewer than 5 words);
  *  - top-2-gram char fraction: (count × gram chars) / chars of the
  *    space-joined word stream, tie-broken (count desc, gram asc), 0
  *    when no 2-gram exists; can exceed 1 on pathological overlap;
  *  - all fractions round half-up to 6 decimals.
  */
object RepetitionStats {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def codePoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  def statsRow(text: UTF8String): InternalRow = {
    val raw = text.toString
    // ---- line metrics ----
    var nLines = 0L
    var totChars = 0L
    var disChars = 0L
    val seenLines = new java.util.HashSet[String]()
    var i = 0
    val len = raw.length
    while (i <= len) {
      var j = i
      while (j < len && raw.charAt(j) != '\n') j += 1
      var end = j
      if (end > i && raw.charAt(end - 1) == '\r') end -= 1
      var a = i
      while (a < end && raw.charAt(a) == ' ') a += 1
      var b = end
      while (b > a && raw.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        nLines += 1
        val line = raw.substring(a, b)
        val chars = codePoints(line)
        totChars += chars
        if (seenLines.add(line)) disChars += chars
      }
      i = j + 1
    }
    // ---- word stream (lowercased) ----
    val s = text.toLowerCase.toString
    val words = new java.util.ArrayList[String]()
    var k = 0
    while (k < s.length) {
      while (k < s.length && isWs(s.charAt(k))) k += 1
      val start = k
      while (k < s.length && !isWs(s.charAt(k))) k += 1
      if (k > start) words.add(s.substring(start, k))
    }
    val nWords = words.size
    // __wchars: length of the space-joined word stream
    var wchars = 0L
    var wi = 0
    while (wi < nWords) { wchars += codePoints(words.get(wi)); wi += 1 }
    if (nWords > 1) wchars += (nWords - 1).toLong
    // ---- 5-gram duplicate fraction ----
    var dup5 = 0.0
    if (nWords >= 5) {
      val total = nWords - 4
      val set5 = new java.util.HashSet[String](total * 2)
      var g = 0
      while (g < total) {
        val sb = new java.lang.StringBuilder(words.get(g))
        var h = 1
        while (h < 5) { sb.append(' ').append(words.get(g + h)); h += 1 }
        set5.add(sb.toString)
        g += 1
      }
      dup5 = 1.0 - set5.size.toDouble / total.toDouble
    }
    // ---- most frequent 2-gram: (count desc, gram asc) ----
    var topFrac = 0.0
    if (nWords >= 2) {
      val counts = new java.util.HashMap[String, Long](nWords * 2)
      var g = 0
      while (g < nWords - 1) {
        val gram = words.get(g) + " " + words.get(g + 1)
        val c = counts.get(gram)
        counts.put(gram, if (c == null) 1L else c + 1L)
        g += 1
      }
      var bestCnt = 0L
      var bestGram: String = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestCnt ||
            (e.getValue == bestCnt &&
              (bestGram == null || e.getKey.compareTo(bestGram) < 0))) {
          bestCnt = e.getValue; bestGram = e.getKey
        }
      }
      val topChars = bestCnt * codePoints(bestGram)
      topFrac = if (wchars == 0) 0.0
        else topChars.toDouble / wchars.toDouble
    }
    val dupLine = if (nLines == 0) 0.0
      else 1.0 - seenLines.size.toDouble / nLines.toDouble
    val dupChar = if (totChars == 0) 0.0
      else 1.0 - disChars.toDouble / totChars.toDouble
    InternalRow(nLines, round6(dupLine), round6(dupChar), round6(dup5),
      round6(topFrac))
  }
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("dup_5gram_frac", DoubleType, nullable = false),
    StructField("top_2gram_char_frac", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.statsRow(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.RepetitionStats.statsRow($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RepetitionFunctions {
  def repetition_stats(text: Column): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(text)))
}
