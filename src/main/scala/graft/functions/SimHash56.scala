package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 56-bit SimHash from an array of pre-computed 60-bit token hashes:
  * per-bit majority vote (+1 for a set bit, -1 for a clear bit; bit set in
  * the signature iff the vote is strictly positive).
  *
  * Semantics mirror the reference pipeline's near-dup fingerprinting needs
  * (SURVEY.md §7.4 "beyond-reference scale operators"); the bit math is the
  * textbook Charikar construction. A native expression (not a UDF) so the
  * single pass lives inside whole-stage codegen: the built-in alternative is
  * 56 separate higher-order `aggregate` folds over the same array, each a
  * CodegenFallback — measured ~20× slower at sf0.1.
  *
  * Null array elements are ignored; a null array yields null.
  */
case class SimHash56(child: Expression) extends UnaryExpression {

  private val Bits = 56

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"simhash56 requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash56"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](Bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var b = 0
        while (b < Bits) {
          if (((x >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[$Bits];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $x = $c.getLong($i);
         |    for (int $b = 0; $b < $Bits; $b++) {
         |      if ((($x >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $Bits; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash56 =
    copy(child = newChild)
}
