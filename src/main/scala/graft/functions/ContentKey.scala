package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused exact-dedup content key:
  * `md5(lower(regexp_replace(text, "^\\s+|\\s+$", "")))` in ONE byte
  * pass — edge-trim by direct byte scan instead of the regex engine, one
  * lowercase allocation, md5 straight over the trimmed slice.
  *
  * Exact parity with the composed form (which the DuckDB oracles keep):
  * Java regex `\s` is ASCII `[ \t\n\x0B\f\r]` — the same set this scan
  * strips (multi-byte UTF-8 units are ≥ 0x80 and never collide with
  * them), trimming before vs after `lower` is indistinguishable because
  * lowercasing never maps a non-whitespace edge char into this set, and
  * the digest is the same lowercase-hex md5 Spark's builtin emits.
  *
  * ONE documented divergence from the Java-regex composed form: Java's
  * `$` also matches before a FINAL line terminator (\\n, \\r, U+0085,
  * U+2028, U+2029), so `regexp_replace(text, "^\\s+|\\s+$", "")` strips
  * ASCII whitespace that precedes a trailing U+0085/U+2028/U+2029 while
  * this end-of-text byte scan does not (the non-ASCII terminator itself
  * is not `\\s` and survives either way).
  * This scan's `\\z`-anchored behavior is the one the RE2-based DuckDB
  * oracle implements (`$` anchors at end-of-text in RE2), so the fused
  * key agrees with the oracle exactly where the old composed form
  * diverged from it. Pinned by the "a \\u2028" input in OpsSpec.
  */
object NormalizedMd5 {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def md5Row(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && isWs(bytes(lo))) lo += 1
    while (hi > lo && isWs(bytes(hi - 1))) hi -= 1
    val lowered =
      UTF8String.fromBytes(bytes, lo, hi - lo).toLowerCase.getBytes
    UTF8String.fromString(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(lowered))
  }
}

case class NormalizedMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalized_md5"

  override def nullSafeEval(a: Any): Any =
    NormalizedMd5.md5Row(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NormalizedMd5.md5Row($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
