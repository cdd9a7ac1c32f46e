package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Vector quantization in one codegen pass: `round(x · scale)` per element
  * of an `array<float|double>` into `array<bigint>` — the embedding-path
  * int64 bridge (EmbeddingQueries), replacing the interpreted
  * `transform(emb, x -> round(x * scale).cast(long))` chain (a per-row
  * lambda interpreter + intermediate array per step).
  *
  * Rounding is `BigDecimal.valueOf(v).setScale(0, HALF_UP)` — the exact
  * code path Spark's `round()` takes for doubles, so output is
  * bit-identical to the built-in formulation (and to DuckDB's `round`,
  * which the oracle parity of v1–v6 already established). Null elements
  * stay null; a null array stays null.
  */
case class QuantizeVec(child: Expression, scale: Int) extends UnaryExpression {

  private def elemType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"quantize_vec requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quantize_vec"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    val isFloat = elemType == FloatType
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = QuantizeVec.quantize(v, scale)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val getter = if (elemType == FloatType) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
      s"""
         |int $n = $c.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    double $v = $getter;
         |    $out[$i] = graft.functions.QuantizeVec$$.MODULE$$.quantize($v, $scale);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeVec {
  /** Mirror of Spark's Round-on-double semantics; a non-finite element
    * fails with a clear error (the replaced round+ANSI-cast chain also
    * threw, via CAST_INVALID_INPUT).
    */
  def quantize(v: Double, scale: Int): Long = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      throw new ArithmeticException(s"quantize_vec: non-finite vector element $v")
    java.math.BigDecimal.valueOf(v * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }
}
