package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** SQ8 serving-state codecs: pack an `array<bigint>` of 8-bit codes
  * (each in [0, 255]) into a `binary` of 1 byte per dim, and back. The
  * STORAGE half of the SQ8 tier (v17–v19 certify the arithmetic): a
  * 64-dim vector's inverted-list row shrinks to 64 bytes on disk, so an
  * nprobe candidate read moves ~3.3× fewer bytes than the fp32 tier and
  * ~1.3× fewer than the integer-grid tier at equal recall (v18 bounds
  * the distortion; ann_demo measures the bytes). Those ratios sit AT the
  * information-theoretic ceilings — fp32 is 4 B/dim (ceiling 4×, minus
  * shared per-row key/page overhead) and parquet bit-packs the grid
  * tier's 11-bit coords to ~11 bits/dim (ceiling 11/8 = 1.375×) — the
  * naive "8 B/dim longs → 8×" figure never reaches disk; SqCodesSpec
  * pins both bounds executable. Both directions are single-pass
  * codegen'd loops — no per-element boxing in the serving path.
  *
  * An out-of-range or null code is a LOUD error: silent truncation would
  * corrupt distances downstream where no gate can see it.
  */
case class PackU8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_u8 requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pack_u8"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException("pack_u8: null code")
      val v = arr.getLong(i)
      if (v < 0L || v > 255L)
        throw new IllegalArgumentException(s"pack_u8: code $v outside [0, 255]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) throw new IllegalArgumentException("pack_u8: null code");
         |  long $v = $c.getLong($i);
         |  if ($v < 0L || $v > 255L)
         |    throw new IllegalArgumentException("pack_u8: code " + $v + " outside [0, 255]");
         |  $out[$i] = (byte) $v;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[PackU8]]: `binary` → `array<bigint>` with unsigned-byte
  * semantics (each element in [0, 255]).
  */
case class UnpackU8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unpack_u8 requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unpack_u8"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = (bytes(i) & 0xff).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.length;
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (long) ($c[$i] & 0xff);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
