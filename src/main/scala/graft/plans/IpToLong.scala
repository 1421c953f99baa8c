package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.IpParse

/** Native Catalyst expression: dotted-quad IPv4 string -> packed Long,
  * null for invalid input (SURVEY §2.9 v2 of P6/F5).
  *
  * The composed-builtin form (`split` + 4 element casts, functions/Net.scala)
  * is already codegen'd but allocates an array and four substrings per row;
  * this expression is one allocation-free byte scan inside whole-stage
  * codegen. Used via [[GraftFunctions.ipToLongNative]]; the generated code
  * calls the same static parser as the interpreted path, so both paths are
  * one implementation.
  */
case class IpToLong(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ip_to_long"

  override def nullSafeEval(input: Any): Any = {
    val r = IpParse.parse(input.asInstanceOf[UTF8String])
    if (r < 0L) null else r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.IpParse.parse(${c.value});
          ${ev.isNull} = ${ev.value} < 0L;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): IpToLong =
    copy(child = newChild)
}

/** Column-level API over the native expressions. */
object GraftFunctions {
  /** Packed IPv4 as Long via the native single-pass parser. */
  def ipToLongNative(ip: Column): Column =
    GraftColumnBridge.column(IpToLong(GraftColumnBridge.expression(ip)))

  /** Native INCIDR: mask-compare on the natively parsed address. The
    * bitwise form is recognized by [[CidrRangeDerivation]], which derives
    * scan-pushable range bounds from it.
    */
  def incidrNative(cidr: String, ip: Column): Column = {
    val (net, mask) = graft.functions.Net.parseCidr(cidr)
    if (mask == 0L) ipToLongNative(ip).isNotNull
    else ipToLongNative(ip).bitwiseAND(org.apache.spark.sql.functions.lit(mask)) ===
      org.apache.spark.sql.functions.lit(net)
  }
}
