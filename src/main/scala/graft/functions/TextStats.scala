package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics in ONE tokenization pass:
  * `struct(n_tokens, punct_ratio, stopword_ratio, lang_guess, quality)`.
  *
  * The declarative [[graft.ops.TextAnalysis.documentStats]] re-split the
  * text ~8 times (token count, stopword filter with an interpreted
  * array_contains lambda, five per-language array_intersects, punctuation
  * regex); this expression reproduces each metric exactly:
  *  - tokens are `\s+` splits of the trimmed text (count is
  *    case-insensitive so one lowercase pass serves all token metrics);
  *  - punct_ratio counts Java `\p{Punct}` ASCII punctuation over
  *    CHARACTERS (the regexp_replace length difference);
  *  - stopword_ratio = tokens ∈ (union of marker lists) / token count,
  *    0.0 for blank text (matching `size(tokens)===0` semantics);
  *  - lang_guess = language with the most DISTINCT marker words present,
  *    ties to the lexicographically LARGEST language name (struct-max),
  *    'und' on zero hits;
  *  - quality = (min(len/200,1) + 1−min(punct·5,1) + min(stop·4,1)) / 3;
  * ratios and quality round half-up to 6 decimals like Spark `round`. */
object TextStats {
  import graft.ops.TextAnalysis.langMarkers

  private val langs: Array[String] = langMarkers.keys.toArray.sorted
  private val markerSets: Array[java.util.HashSet[UTF8String]] =
    langs.map { l =>
      val s = new java.util.HashSet[UTF8String]()
      langMarkers(l).foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    langMarkers.values.flatten.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  private val undLang = UTF8String.fromString("und")
  private val langUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def statsRow(text: UTF8String): InternalRow = {
    val raw = text.toString
    // Spark's length() counts code points, not UTF-16 units
    val len = text.numChars().toDouble
    // punctuation over the ORIGINAL characters
    var nPunct = 0L
    var pi = 0
    while (pi < raw.length) {
      if (isPunct(raw.charAt(pi))) nPunct += 1
      pi += 1
    }
    // one lowercase tokenization serves count/stopwords/markers
    val s = text.toLowerCase.toString
    var nTokens = 0L
    var nStop = 0L
    val perLangDistinct = new Array[java.util.HashSet[UTF8String]](langs.length)
    var k = 0
    while (k < s.length) {
      while (k < s.length && isWs(s.charAt(k))) k += 1
      val start = k
      while (k < s.length && !isWs(s.charAt(k))) k += 1
      if (k > start) {
        nTokens += 1
        val tok = UTF8String.fromString(s.substring(start, k))
        if (stopSet.contains(tok)) {
          nStop += 1
          var li = 0
          while (li < langs.length) {
            if (markerSets(li).contains(tok)) {
              if (perLangDistinct(li) == null)
                perLangDistinct(li) = new java.util.HashSet[UTF8String]()
              perLangDistinct(li).add(tok)
            }
            li += 1
          }
        }
      }
    }
    val punctRatio = if (len == 0) 0.0 else nPunct.toDouble / len
    val stopRatio = if (nTokens == 0) 0.0 else nStop.toDouble / nTokens
    // struct-max (hits, lang): highest distinct-hit count, ties to the
    // lexicographically largest language
    var bestHits = 0L
    var bestLang: UTF8String = null
    var li = 0
    while (li < langs.length) {
      val h = if (perLangDistinct(li) == null) 0L
        else perLangDistinct(li).size.toLong
      if (h > bestHits || (h == bestHits && bestLang != null &&
          langUtf8(li).compareTo(bestLang) > 0) ||
          (bestLang == null)) {
        bestHits = h; bestLang = langUtf8(li)
      }
      li += 1
    }
    val lang = if (bestHits == 0) undLang else bestLang
    val lenScore = math.min(len / 200.0, 1.0)
    val punctScore = 1.0 - math.min(punctRatio * 5.0, 1.0)
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val quality = round6((lenScore + punctScore + stopScore) / 3.0)
    InternalRow(nTokens, round6(punctRatio), round6(stopRatio), lang,
      quality)
  }
}

case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("lang_guess", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
  override def prettyName: String = "text_stats"

  override def nullSafeEval(a: Any): Any =
    TextStats.statsRow(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextStats.statsRow($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextStatsFunctions {
  def text_stats(text: Column): Column =
    Bridge.column(TextStatsExpr(Bridge.expression(text)))
}
