package graft.functions

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` for heterogeneous ("mixed-type") cells —
  * the one place the reference's per-cell runtime dispatch
  * (`puffbird/frame.py:35-47`) is semantically required and a static
  * schema can't express it (SURVEY §7.5: mixed columns like the
  * tutorial's `g`). Cells travel as JSON strings; each explosion step
  * inspects the actual cell:
  *
  *  - JSON array  → one row per element, level = position ("0", "1", …)
  *  - JSON object → one row per field, level = key
  *  - scalar      → a single row with a null level and the value itself
  *    (the reference wraps scalars as `{NaN: x}` — null-level-for-scalar,
  *    SURVEY §2.13.5)
  *  - unparseable text → treated as a scalar string (JSON-quoted)
  *
  * Values stay JSON text, so the step composes with itself — `toLong`'s
  * `maxDepth` bounds the recursion exactly like the reference's loop
  * (`puffbird/frame.py:511-514`).
  */
case class JsonExplodeExpr(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType)))

  @transient private lazy val mapper = new ObjectMapper()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val text = raw.toString
    val node =
      try mapper.readTree(text)
      catch { case NonFatal(_) => mapper.getNodeFactory.textNode(text) }
    node match {
      case a: ArrayNode =>
        (0 until a.size()).map { i =>
          InternalRow(UTF8String.fromString(i.toString),
            UTF8String.fromString(a.get(i).toString))
        }
      case o: ObjectNode =>
        val it = o.fields()
        val buf = Seq.newBuilder[InternalRow]
        while (it.hasNext) {
          val e = it.next()
          buf += InternalRow(UTF8String.fromString(e.getKey),
            UTF8String.fromString(e.getValue.toString))
        }
        buf.result()
      case scalar =>
        Seq(InternalRow(null, UTF8String.fromString(scalar.toString)))
    }
  }

  override protected def withNewChildInternal(c: Expression): JsonExplodeExpr =
    copy(child = c)
}
