package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the monotone log-grid cell key of the
  * grouped exact-quantile operator ([[graft.ops.Profiling]]) — for the
  * fixed-point Long `x`:
  *
  *   x > 0 : bitlen(x)·64 + (x >>> max(bitlen−7, 0))
  *   x = 0 : 0
  *   x < 0 : −key(−x)
  *
  * One `Long.numberOfLeadingZeros` intrinsic inside whole-stage codegen.
  * The composed-builtin forms both lose: `length(bin(x))` allocates a
  * per-row STRING (+0.3 s per 600k-row scan measured at sf0.1), and a
  * 63-term threshold-indicator sum blows the expression past the
  * 8KB-bytecode codegen method budget into the interpreter (the
  * hugeMethodLimit trap — measured 6× worse than the string form).
  * Generated code calls the same static as the interpreted path.
  */
case class CellKey(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long column, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cell_key"

  override def nullSafeEval(input: Any): Any =
    CellKey.key(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CellKey.key($c)")

  override protected def withNewChildInternal(newChild: Expression): CellKey =
    copy(child = newChild)
}

object CellKey {
  /** Shared by interpreted eval and generated code. `x` is the quantile
    * grid's fixed-point fold, |x| ≤ 2^62 by construction — negation and
    * the ·64 scale cannot overflow.
    */
  def key(x: Long): Long = {
    if (x == 0L) return 0L
    val a = math.abs(x)
    val bl = 64L - java.lang.Long.numberOfLeadingZeros(a)
    val shift = math.max(bl - 7L, 0L).toInt
    val k = bl * 64L + (a >>> shift)
    if (x > 0L) k else -k
  }

  def keyCol(x: Column): Column =
    GraftColumnBridge.column(CellKey(GraftColumnBridge.expression(x)))
}
