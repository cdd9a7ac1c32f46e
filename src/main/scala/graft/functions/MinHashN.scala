package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `slices` independent minhash values from an array of 60-bit shingle
  * hashes in ONE pass — the fused wide-signature path the 100 TB LSH
  * preset needs (32 bands × 4 rows = 128 slices), replacing a per-slice
  * md5 re-hash (~100× the arithmetic plus string/digest allocation per
  * shingle).
  *
  * Slice hash family: `v_j = (a_j·x1 + b_j·x2 + c_j) mod 4294967291` with
  * `x1 = h & 0xFFFFFFFF`, `x2 = h >> 30` and per-slice coefficients
  * `a_j, b_j ∈ [1, 2^30)`, `c_j ∈ [0, 2^30)` derived deterministically
  * from the slice index ([[MinHashN.coefficients]]) — a 2-universal-style
  * integer family chosen so every product stays below 2^62: NO 64-bit
  * wraparound anywhere, which is what lets the DuckDB oracle replay the
  * identical math in plain BIGINT SQL (DuckDB errors on signed overflow
  * rather than wrapping). Empty, null, and all-null-elements input all
  * yield null — one degenerate result, matching [[MinHash8]].
  */
case class MinHashN(child: Expression, slices: Int) extends UnaryExpression {
  require(slices >= 1 && slices <= 4096, s"slices out of range: $slices")

  @transient private lazy val coefs: (Array[Long], Array[Long], Array[Long]) =
    MinHashN.coefficients(slices)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_n requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_n"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val (as, bs, cs) = coefs
    val mins = Array.fill(slices)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        // the no-wraparound proof needs h < 2^60 (the h60 digest contract);
        // outside it Java would wrap silently while the SQL mirror errors
        // or diverges — fail loudly instead
        if ((h & ~((1L << 60) - 1)) != 0)
          throw new IllegalArgumentException(s"minhash_n input outside 60-bit digest range: $h")
        val x1 = h & 0xFFFFFFFFL
        val x2 = h >>> 30
        var j = 0
        while (j < slices) {
          val v = (as(j) * x1 + bs(j) * x2 + cs(j)) % MinHashN.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    // no hashable element at all (empty OR all-null) → null, ONE degenerate
    // result: an array of Long.MaxValue sentinels would look like a real
    // signature to a direct caller and collide in every band
    if (!seen) null else new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (as, bs, cs) = coefs
      val aRef = ctx.addReferenceObj("mhnA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhnB", bs, "long[]")
      val cRef = ctx.addReferenceObj("mhnC", cs, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val x1 = ctx.freshName("x1")
      val x2 = ctx.freshName("x2")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $c.numElements();
         |boolean $seen = false;
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$slices];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$c.isNullAt($i)) {
         |      $seen = true;
         |      long $h = $c.getLong($i);
         |      if (($h & ~((1L << 60) - 1)) != 0)
         |        throw new IllegalArgumentException("minhash_n input outside 60-bit digest range: " + $h);
         |      long $x1 = $h & ${0xFFFFFFFFL}L;
         |      long $x2 = $h >>> 30;
         |      for (int $j = 0; $j < $slices; $j++) {
         |        long $v = ($aRef[$j] * $x1 + $bRef[$j] * $x2 + $cRef[$j]) % ${MinHashN.P}L;
         |        if ($v < $mins[$j]) $mins[$j] = $v;
         |      }
         |    }
         |  }
         |  // all-null behaves like empty: no signature, not a sentinel array
         |  if (!$seen) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashN =
    copy(child = newChild)
}

object MinHashN {
  /** Largest 32-bit prime: the slice-hash modulus. */
  val P = 4294967291L

  /** Deterministic per-slice coefficients via the splitmix64 mixer (runs on
    * the DRIVER only — the JVM's wraparound is fine here; executors and the
    * SQL oracle both receive the finished values as literals).
    */
  def coefficients(slices: Int): (Array[Long], Array[Long], Array[Long]) = {
    def mix(i: Long): Long = {
      var z = i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val as = Array.tabulate(slices)(j => (mix(3L * j) >>> 34) | 1L)     // [1, 2^30), odd
    val bs = Array.tabulate(slices)(j => (mix(3L * j + 1) >>> 34) | 1L) // [1, 2^30), odd
    val cs = Array.tabulate(slices)(j => mix(3L * j + 2) >>> 34)        // [0, 2^30)
    (as, bs, cs)
  }

  /** The slice-j hash as a DuckDB SQL lambda body over variable `h` —
    * literal coefficients from [[coefficients]], plain BIGINT arithmetic
    * (every intermediate < 2^62).
    */
  def sliceSql(slices: Int, j: Int, h: String = "h"): String = {
    val (as, bs, cs) = coefficients(slices)
    s"(${as(j)} * ($h & 4294967295) + ${bs(j)} * ($h >> 30) + ${cs(j)}) % $P"
  }
}
