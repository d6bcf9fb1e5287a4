package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the shingle pipeline.
  *
  * The composable form (`transform(sequence(...), i => concat_ws(slice))`
  * + `md5`/`conv` per element) evaluates every lambda through the
  * interpreted Catalyst eval path — dozens of µs per document. These
  * expressions do the same work in one tight JVM loop per row.
  * Semantics are unchanged (the DuckDB oracles still reproduce them);
  * output order of the distinct set differs from `array_distinct`'s
  * first-occurrence order, which is fine because every consumer (min,
  * sort, set-intersect) is order-insensitive.
  */

/** Distinct word n-gram shingles of a lowercased, whitespace-split text.
  * Matches `TextFunctions.shingles`: texts shorter than `n` words yield
  * the single whole-text shingle.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val words = text.trim.toLowerCase.split("\\s+")
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (words.length >= n) {
      val sb = new java.lang.StringBuilder(n * 12)
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    } else {
      out.add(UTF8String.fromString(words.mkString(" ")))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** Content fingerprint of a string array in one pass: md5 over the
  * elements sorted ascending and joined with a single space — equal to
  * `md5(array_join(sort_array(arr), " "))` (and the DuckDB oracle's
  * `md5(array_to_string(list_sort(sh), ' '))`) without the interpreted
  * sort/join/copy chain.
  */
case class FingerprintExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val elems = new Array[UTF8String](n)
    var i = 0
    while (i < n) { elems(i) = arr.getUTF8String(i); i += 1 }
    // UTF8String's natural order is binary — identical to sort_array and
    // to DuckDB's byte-order list_sort, also for non-ASCII
    java.util.Arrays.sort(elems,
      java.util.Comparator.naturalOrder[UTF8String]())
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(
      UTF8String.concatWs(UTF8String.fromString(" "), elems: _*).getBytes)
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): FingerprintExpr =
    copy(child = c)
}

/** Portable 60-bit hash of every element of a string array: the first 15
  * hex digits of md5 as a long — bit-identical to
  * `conv(substr(md5(s),1,15),16,10)` and to the DuckDB oracle's
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`.
  */
case class Hash60ArrayExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nElems = arr.numElements()
    val out = new Array[Any](nElems)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nElems) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex digits = first 60 bits, big-endian
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Hash60ArrayExpr =
    copy(child = c)
}
