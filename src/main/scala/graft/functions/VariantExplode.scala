package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Native `VariantType` explosion step — the modern form of the
  * heterogeneous-cell dispatch (SURVEY §7.5 option b; the JSON-string
  * [[JsonExplodeExpr]] is the portable fallback). One row's variant is
  * inspected at runtime:
  *
  *  - ARRAY  → one row per element, level = position ("0", "1", …)
  *  - OBJECT → one row per field, level = key
  *  - scalar → one row, null level, the value itself
  *
  * Values stay `VariantType` (sub-variants are re-packed standalone), so
  * the step composes with itself under `toLong`'s `maxDepth`, exactly
  * like the reference's per-cell loop (`puffbird/frame.py:505-525`).
  */
case class VariantExplodeExpr(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", VariantType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val vv = raw.asInstanceOf[VariantVal]
    val v = new Variant(vv.getValue, vv.getMetadata)
    v.getType match {
      case VariantUtil.Type.ARRAY =>
        (0 until v.arraySize()).map { i =>
          val e = v.getElementAtIndex(i)
          InternalRow(UTF8String.fromString(i.toString),
            new VariantVal(e.getValue, e.getMetadata))
        }
      case VariantUtil.Type.OBJECT =>
        (0 until v.objectSize()).map { i =>
          val f = v.getFieldAtIndex(i)
          InternalRow(UTF8String.fromString(f.key),
            new VariantVal(f.value.getValue, f.value.getMetadata))
        }
      case _ =>
        Seq(InternalRow(null, vv))
    }
  }

  override protected def withNewChildInternal(c: Expression): VariantExplodeExpr =
    copy(child = c)
}
