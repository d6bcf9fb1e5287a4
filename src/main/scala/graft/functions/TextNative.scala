package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static compute kernels for the hot-path text expressions
  * ([[ShinglesExpr]], [[CharShinglesExpr]], [[NgramsExpr]],
  * [[Hash60ArrayExpr]]) — ONE implementation shared by the interpreted
  * `nullSafeEval` path and the generated code: each expression's
  * `doGenCode` emits a single static call into this object, so the
  * expression participates in whole-stage codegen (no
  * CodegenFallback row materialization, no per-row virtual dispatch
  * through the references array) while the loop itself stays compiled
  * Scala. Scala `object` methods compile to static forwarders, which
  * is exactly what Janino-generated Java can call.
  */
object TextNative {

  /** [[ShinglesExpr]]: distinct word n-gram shingles. */
  def shingles(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
    // Locale.ROOT: default-locale lowercasing diverges from DuckDB's
    // locale-independent lower() on e.g. a Turkish JVM ('I' -> U+0131)
    val words = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
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

  /** [[CharShinglesExpr]]: distinct char n-gram shingles with optional
    * in-loop universe sampling.
    */
  def charShingles(input: UTF8String, n: Int,
      keepLastCpMod: Int): ArrayData = {
    val str = input.toString
    val cps = str.codePoints().toArray
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (cps.length >= n) {
      var i = 0
      while (i <= cps.length - n) {
        val lastCp = cps(i + n - 1)
        if (keepLastCpMod <= 1 || lastCp % keepLastCpMod == 0)
          out.add(UTF8String.fromString(new String(cps, i, n)))
        i += 1
      }
    } else {
      // short texts ALWAYS keep their whole-text shingle, even when
      // sampling (see CharShinglesExpr's contract note)
      out.add(UTF8String.fromString(str))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** [[NgramsExpr]]: ALL positional word n-grams, document order. */
  def ngrams(input: UTF8String, n: Int): ArrayData = {
    val raw = input.toString.toLowerCase(java.util.Locale.ROOT)
    // space-only trim (Spark/DuckDB `trim`), NOT Java String.trim which
    // also strips \t\n\r and diverges from the SQL oracles
    var s = 0; var e = raw.length
    while (s < e && raw.charAt(s) == ' ') s += 1
    while (e > s && raw.charAt(e - 1) == ' ') e -= 1
    val words = raw.substring(s, e).split("\\s+", -1)
    val count = math.max(0, words.length - n + 1)
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder(n * 12)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[Hash60ArrayExpr]]: portable 60-bit md5-prefix hash of every
    * element, optionally reduced mod a constant.
    */
  def hash60Array(arr: ArrayData, mod: Long): ArrayData = {
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
      val h = v >>> 4
      out(i) = if (mod > 0) h % mod else h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[graft.functions.CharEntropyExpr]]: Shannon entropy (bits) of the
    * CODE-POINT distribution — `log2(n) − (Σ c·log2 c)/n`, with the sum
    * taken in ascending code-point order so the double is deterministic
    * for a given text. Empty input reads 0.0. Code points, not grapheme
    * clusters: a combining sequence counts as its parts (the oracle's
    * splitter only diverges on combining marks, which the gate corpus
    * does not contain — the spec pins the code-point contract).
    */
  def charEntropy(input: UTF8String): Double = {
    val s = input.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(Integer.valueOf(cp))
      counts.put(Integer.valueOf(cp),
        java.lang.Long.valueOf(if (prev == null) 1L else prev.longValue + 1L))
      i += Character.charCount(cp)
      n += 1
    }
    val ln2 = math.log(2.0)
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().doubleValue
      acc += c * (math.log(c) / ln2)
    }
    math.log(n.toDouble) / ln2 - acc / n
  }
}
