package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies: `array<string>` of tokens →
  * `array<struct<t: string, tf: long>>` with one entry per DISTINCT
  * token, counted in one local hash pass.
  *
  * This replaces the `explode → groupBy(id, token)` shape for
  * per-document tf: the aggregation that used to shuffle one row per
  * token OCCURRENCE corpus-wide now happens inside the row (document
  * lengths bound the hash), so downstream pipelines shuffle only
  * per-(doc, distinct-token) rows they actually need — and map-side
  * partial aggregation sees pre-combined input.
  *
  * Entry order is insertion order (first occurrence), deterministic for a
  * given token stream.
  */
object TokenCounts {
  def countRow(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Long](
      math.max(16, n / 2))
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val c = m.get(t)
      m.put(t, if (c == null) 1L else c + 1L)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused `token_counts(words(text))` directly over the raw text: one
  * lowercase pass plus one byte scan — no regex split, no intermediate
  * token array. Exact parity with `words()`
  * ([[graft.ops.TextAnalysis.words]]): tokens are maximal runs of
  * non-whitespace in `lower(text)` where whitespace is Java regex `\s` =
  * ASCII `[ \t\n\x0B\f\r]` (multi-byte UTF-8 units are ≥ 0x80 and never
  * collide), and blank/null text yields an empty array.
  */
object TfFromText {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def countRow(text: UTF8String): ArrayData = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    val m = new java.util.LinkedHashMap[UTF8String, Long](64)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        val t = UTF8String.fromBytes(bytes, start, i - start)
        val c = m.get(t)
        m.put(t, if (c == null) 1L else c + 1L)
      }
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Lowercased token ARRAY by byte scan — exact
  * [[graft.ops.TextAnalysis.words]] parity for non-blank text: maximal
  * runs of non-`\s` in `lower(text)` (ASCII whitespace; multi-byte UTF-8
  * units are ≥ 0x80). Blank input yields an EMPTY array (callers guard
  * null with coalesce, matching words()' blank branch). NOT a drop-in
  * for `tokens()`, whose un-guarded split of "" yields `[""]`. */
object TokensOf {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def tokensRow(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](16)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }
}

/** Token → vocabulary-id encoding in ONE fused byte-scan pass: the
  * [[TokensOf]] tokenizer with an inline hash lookup per token — no
  * token explode, no broadcast join, no positional reassembly shuffle.
  * The vocabulary rides the expression as a driver-built reference
  * object (it is top-N by construction — the [[BloomStatsExpr]] mask
  * pattern). Misses encode as `oovId`; blank text yields an empty
  * array. */
object TokenIds {
  def idsRow(text: UTF8String,
      vocab: java.util.HashMap[UTF8String, java.lang.Long],
      oovId: Long): ArrayData = {
    // delegate tokenization to [[TokensOf]] — ONE tokenizer definition,
    // so the vocab-build tokens and the encode tokens can never drift
    val toks = TokensOf.tokensRow(text)
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val id = vocab.get(toks.getUTF8String(i))
      out(i) = if (id == null) java.lang.Long.valueOf(oovId) else id
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class TokenIdsExpr(child: Expression,
    vocab: java.util.HashMap[UTF8String, java.lang.Long], oovId: Long)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ids"

  override def nullSafeEval(a: Any): Any =
    TokenIds.idsRow(a.asInstanceOf[UTF8String], vocab, oovId)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("tokenVocab", vocab,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TokenIds.idsRow($x, $vref, ${oovId}L);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class TokensOfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens_of"

  override def nullSafeEval(a: Any): Any =
    TokensOf.tokensRow(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TokensOf.tokensRow($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Plain token COUNT by byte scan — the `size(split(trim(text), "\\s+"))`
  * count without the regex or the token array. Same `\s` semantics as
  * [[TfFromText]]; case never affects a count. */
object TokenCountOf {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def countTokens(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    var count = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) { count += 1; while (i < n && !isWs(bytes(i))) i += 1 }
    }
    count
  }
}

case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_count"

  override def nullSafeEval(a: Any): Any =
    TokenCountOf.countTokens(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TokenCountOf.countTokens($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class TfFromTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "tf_from_text"

  override def nullSafeEval(a: Any): Any =
    TfFromText.countRow(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TfFromText.countRow($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class TokenCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_counts"

  override def nullSafeEval(a: Any): Any =
    TokenCounts.countRow(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TokenCounts.countRow($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextFunctions {
  def token_counts(tokens: Column): Column =
    Bridge.column(TokenCountsExpr(Bridge.expression(tokens)))
  def tf_from_text(text: Column): Column =
    Bridge.column(TfFromTextExpr(Bridge.expression(text)))
  def token_count(text: Column): Column =
    Bridge.column(TokenCountExpr(Bridge.expression(text)))
  def tokens_of(text: Column): Column =
    Bridge.column(TokensOfExpr(Bridge.expression(text)))
  def token_ids(text: Column,
      vocab: java.util.HashMap[UTF8String, java.lang.Long],
      oovId: Long): Column =
    Bridge.column(TokenIdsExpr(Bridge.expression(text), vocab, oovId))
}
