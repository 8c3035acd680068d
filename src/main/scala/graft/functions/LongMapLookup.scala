package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Serializable open-addressing primitive long→long hash map.
  *
  * Replaces `element_at` over a `MapType` literal in the compiler's
  * local id-translation fast path: Catalyst's `GetMapValue` on an
  * ArrayBasedMapData literal is a LINEAR scan per lookup, so a 65k-entry
  * map (the `spark.graft.compiler.localMapMaxRows` default gate) paid up
  * to 65k comparisons per array slot — O(1) probing here. Linear
  * probing, power-of-two table at ≤50% load, `Long.MinValue` as the
  * empty-slot sentinel (a real `Long.MinValue` key is carried in a side
  * field). Arrays serialize compactly with the task closure — the same
  * shipping cost profile as the map literal it replaces.
  */
final class LongLongMap(m: Map[Long, Long]) extends Serializable {
  // size captured as a plain field so the boxed source Map is NOT
  // retained (a constructor param referenced only here would otherwise
  // become a field and ship with every task closure alongside the
  // open-addressed arrays, doubling the serialized weight)
  val size: Int = m.size
  private val cap: Int = {
    var c = 4
    while (c < size * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val ks = Array.fill(cap)(Long.MinValue)
  private val vs = new Array[Long](cap)
  private var hasMin = false
  private var minVal = 0L

  private def slot(k: Long): Int = {
    val h = k * 0x9E3779B97F4A7C15L
    (h ^ (h >>> 32)).toInt & mask
  }

  for ((k, v) <- m) {
    if (k == Long.MinValue) { hasMin = true; minVal = v }
    else {
      var i = slot(k)
      while (ks(i) != Long.MinValue && ks(i) != k) i = (i + 1) & mask
      ks(i) = k; vs(i) = v
    }
  }

  /** Mapped value when the key is present, the key itself otherwise —
    * exactly `coalesce(element_at(mapLit, x), x)`. */
  def getOrSelf(k: Long): Long = {
    if (k == Long.MinValue) return if (hasMin) minVal else k
    var i = slot(k)
    while (true) {
      val kk = ks(i)
      if (kk == k) return vs(i)
      if (kk == Long.MinValue) return k
      i = (i + 1) & mask
    }
    k // unreachable: table load ≤ 50% guarantees an empty slot
  }
}

/** `coalesce(element_at(mapLiteral, x), x)` as one codegen'd O(1) hash
  * probe. Null input → null (the `element_at`+`coalesce` pipeline's
  * exact semantics: a null key finds nothing and coalesce returns the
  * null input). The table rides `ctx.addReferenceObj`, so the PLAN
  * carries a tiny opaque reference instead of a 65k-entry literal —
  * canonicalization and plan rendering stay O(1) in the map size. */
case class LongMapLookupOrSelf(child: Expression, table: LongLongMap)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "long_map_lookup_or_self"

  override def nullSafeEval(x: Any): Any =
    table.getOrSelf(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLongMap", table,
      classOf[LongLongMap].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.getOrSelf($x);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
