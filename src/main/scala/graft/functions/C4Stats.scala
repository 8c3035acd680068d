package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType,
  LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused C4 quality signals in ONE text pass:
  * `struct(n_lines, terminal_punct_line_frac, has_lorem, has_brace,
  * mean_words_per_line)`.
  *
  * The declarative form evaluated an interpreted `filter(lines,
  * l -> l.rlike(...))` lambda per line plus three separate `split`s of
  * the same text; this expression replicates those semantics exactly —
  * lines are `\r?\n` splits trimmed by Spark's `trim` (`UTF8String
  * .trim`, ASCII space) and dropped when empty; a line "ends with
  * terminal punctuation" iff its last byte is one of `.!?"'` (the
  * regex `[.!?"']$` on a newline-free string; multi-byte UTF-8 tails
  * are ≥ 0x80 and can never match); words are maximal `\s+`-free runs
  * of the trimmed text (count only — case does not change the count);
  * `lorem ipsum` is searched in the lowercased text. Fractions round
  * half-up to 6 decimals like Spark's `round`. */
object C4Stats {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def statsRow(text: UTF8String): InternalRow = {
    val s = text.toString
    // ---- line metrics: split on \r?\n, trim, drop empties ----
    var nLines = 0L
    var nTerminal = 0L
    var i = 0
    val len = s.length
    while (i <= len) {
      var j = i
      while (j < len && s.charAt(j) != '\n') j += 1
      // line is s[i, j) minus a trailing \r (the \r?\n split)
      var end = j
      if (end > i && s.charAt(end - 1) == '\r') end -= 1
      // Spark trim: strip ASCII ' ' only (UTF8String.trim semantics)
      var a = i
      while (a < end && s.charAt(a) == ' ') a += 1
      var b = end
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      if (b > a) {
        nLines += 1
        val last = s.charAt(b - 1)
        if (last == '.' || last == '!' || last == '?' || last == '"' ||
            last == '\'') nTerminal += 1
      }
      i = j + 1
    }
    // ---- word count: maximal non-\s runs ----
    var nWords = 0L
    var k = 0
    while (k < len) {
      while (k < len && isWs(s.charAt(k).toByte) && s.charAt(k) < 128) k += 1
      if (k < len && !(s.charAt(k) < 128 && isWs(s.charAt(k).toByte))) {
        nWords += 1
        while (k < len && !(s.charAt(k) < 128 && isWs(s.charAt(k).toByte)))
          k += 1
      }
    }
    val hasLorem = s.toLowerCase.contains("lorem ipsum")
    val hasBrace = s.indexOf('{') >= 0
    val termFrac = if (nLines == 0) 0.0
      else round6(nTerminal.toDouble / nLines.toDouble)
    val meanWords = if (nLines == 0) 0.0
      else round6(nWords.toDouble / nLines.toDouble)
    InternalRow(nLines, termFrac, hasLorem, hasBrace, meanWords)
  }
}

case class C4StatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("terminal_punct_line_frac", DoubleType, nullable = false),
    StructField("has_lorem", BooleanType, nullable = false),
    StructField("has_brace", BooleanType, nullable = false),
    StructField("mean_words_per_line", DoubleType, nullable = false)))
  override def prettyName: String = "c4_stats"

  override def nullSafeEval(a: Any): Any =
    C4Stats.statsRow(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.C4Stats.statsRow($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object C4Functions {
  def c4_stats(text: Column): Column =
    Bridge.column(C4StatsExpr(Bridge.expression(text)))
}
