package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL LSH band keys from an array of 60-bit shingle digests in ONE pass —
  * the fused form of `signatures → element_at slices → md5(concat_ws(…))`
  * that the per-document band paths (DedupQueries.docBandRows /
  * docShinglesAndBands — the incremental-ingest and streaming guards)
  * previously built as stacked projections. That stacked form is the
  * CollapseProject hazard the bandSigsCached comment documents: the band
  * expressions fold onto the raw minhash call and the WHOLE shingle→
  * minhash pipeline re-evaluates once per band column — profiled at 57–66 s
  * of the ×10 incremental legs' day-0 (32 bands × a 128-slice signature
  * per row) where one honest pass costs ~5 s. A single expression cannot
  * be collapsed into multiple copies.
  *
  * Bit-exact replication of the built-in chain (parity-pinned in
  * BandKeysSpec at both preset geometries):
  *  - signature: `numMinhash ≤ 8` → the [[MinHash8]] 32-bit digest-window
  *    slices (note: all-null-elements input yields MaxValue minima there);
  *    wider → the [[MinHashN]] 2-universal family (all-null yields a null
  *    signature) — the same geometry dispatch as
  *    `DedupQueries.signaturesFor`;
  *  - band b = lowercase-hex md5 of `concat_ws("_", slice strings)` over
  *    its `rowsPerBand` adjacent signature values — and, exactly like
  *    concat_ws over null columns, a NULL signature (null/empty shingle
  *    set) yields md5("") in every band;
  *  - output: array<string> of numBands keys, never null.
  *
  * CodegenFallback, deliberately: the per-row cost is the internal
  * slice/digest loops, not the dispatch, and a custom doGenCode would
  * duplicate 60 lines of MD5 plumbing for no measurable win.
  */
case class BandKeys(child: Expression, numMinhash: Int, numBands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numMinhash >= 1 && numBands >= 1 && numMinhash % numBands == 0,
    s"bad band geometry: $numMinhash minhashes / $numBands bands")

  private val rowsPerBand = numMinhash / numBands

  @transient private lazy val coefs: (Array[Long], Array[Long], Array[Long]) =
    MinHashN.coefficients(numMinhash)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"band_keys requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "band_keys"

  override def eval(input: InternalRow): Any = {
    val childVal = child.eval(input)
    val sig: Array[Long] =
      if (childVal == null) null
      else {
        val arr = childVal.asInstanceOf[ArrayData]
        val n = arr.numElements()
        if (n == 0) null
        else if (numMinhash <= 8) {
          // MinHash8 window family — including its all-null-elements
          // behavior (MaxValue minima, NOT a null signature)
          val mins = Array.fill(numMinhash)(Long.MaxValue)
          var i = 0
          while (i < n) {
            if (!arr.isNullAt(i)) {
              val h = arr.getLong(i)
              var j = 0
              while (j < numMinhash) {
                val v = (h >>> (4 * j)) & 0xFFFFFFFFL
                if (v < mins(j)) mins(j) = v
                j += 1
              }
            }
            i += 1
          }
          mins
        } else {
          val (as, bs, cs) = coefs
          val mins = Array.fill(numMinhash)(Long.MaxValue)
          var seen = false
          var i = 0
          while (i < n) {
            if (!arr.isNullAt(i)) {
              seen = true
              val h = arr.getLong(i)
              if ((h & ~((1L << 60) - 1)) != 0)
                throw new IllegalArgumentException(s"band_keys input outside 60-bit digest range: $h")
              val x1 = h & 0xFFFFFFFFL
              val x2 = h >>> 30
              var j = 0
              while (j < numMinhash) {
                val v = (as(j) * x1 + bs(j) * x2 + cs(j)) % MinHashN.P
                if (v < mins(j)) mins(j) = v
                j += 1
              }
            }
            i += 1
          }
          if (!seen) null else mins
        }
      }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[AnyRef](numBands)
    var b = 0
    while (b < numBands) {
      val s =
        if (sig == null) ""
        else {
          val sb = new java.lang.StringBuilder(rowsPerBand * 12)
          var r = 0
          while (r < rowsPerBand) {
            if (r > 0) sb.append('_')
            sb.append(sig(b * rowsPerBand + r))
            r += 1
          }
          sb.toString
        }
      md.reset()
      val digest = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = Character.forDigit((digest(k) >> 4) & 0xF, 16)
        hex(2 * k + 1) = Character.forDigit(digest(k) & 0xF, 16)
        k += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}
