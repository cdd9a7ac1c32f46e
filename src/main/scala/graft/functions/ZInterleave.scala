package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave of two non-negative bucket ids.
  *
  * Used by [[graft.layout.Layout.writeZClustered]]: sorting by the
  * interleaved value clusters rows that are close in BOTH dimensions into
  * the same files, so parquet footer min/max statistics prune scans with
  * predicates on either column — the standard multi-dimensional data
  * layout for large tables (a 1-D sort gives perfect pruning on one
  * column and none on the other).
  *
  * The lower 31 bits of each input interleave into a 62-bit z-value
  * (a: even bit positions, b: odd); callers bucketize raw values into
  * [0, 2^31) first. Negative inputs are masked to their low 31 bits.
  */
object Morton {
  /** Spread the low 31 bits of x to even bit positions (magic-number
    * Morton spread, public-domain bit trick).
    */
  def spread(x: Long): Long = {
    var v = x & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}

case class ZInterleave(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(s"z_interleave requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_interleave"

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Morton.interleave($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}
