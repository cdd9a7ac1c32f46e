package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-gram shingle digests of a text column, in one pass:
  * lowercase → `[a-z0-9]+` tokens → space-joined n-token windows →
  * first-occurrence-distinct → 60-bit md5-derived hash per shingle
  * (the first 15 hex digits of md5, i.e. the engine-wide `h60`).
  *
  * Exactly equivalent to the composed built-ins
  * `transform(array_distinct(shingles(tokens(text), n)), h60)` — and to the
  * DuckDB rendering used by the oracles — but a single tight JVM scan
  * instead of four interpreted higher-order passes building throwaway
  * intermediate arrays; ~5× faster shingle-set materialization at sf0.1.
  * Long digests keep downstream work integer-only: Jaccard intersects
  * longs, and minhash slices are bit shifts ([[MinHash8]]).
  *
  * Tokenization matches `regexp_extract_all(lower(text), '[a-z0-9]+')`:
  * the byte-level scan is equivalent because UTF-8 continuation/lead bytes
  * never collide with ASCII `[a-z0-9]`.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"shingle size must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(s"shingle_hashes requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // mirror lower(text) exactly (UTF8String handles non-ASCII lowering)
    val bytes = text.toLowerCase.getBytes
    // tokenize: ASCII [a-z0-9] runs
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (start, end)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        while (i < bytes.length && {
          val c = bytes(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        tokens += ((start, i))
      } else i += 1
    }
    // n-token windows, space-joined; window starts 0..max(len-n, 0)
    // (matches shingles(): at least one window even when len < n)
    val nWindows = math.max(tokens.length - (n - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var w = 0
    while (w < nWindows) {
      sb.setLength(0)
      var j = w
      val last = math.min(w + n, tokens.length)
      while (j < last) {
        if (j > w) sb.append(' ')
        val (s, e) = tokens(j)
        var k = s
        while (k < e) { sb.append(bytes(k).toChar); k += 1 }
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits = high 60 bits of the first 8 digest bytes,
      // matching conv(substring(md5(x), 1, 15), 16, 10)
      var h60 = 0L
      var h = 0
      while (h < 8) { h60 = (h60 << 8) | (digest(h) & 0xffL); h += 1 }
      h60 = h60 >>> 4
      seen.add(h60)
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
