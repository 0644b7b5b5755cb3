package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cross-engine-portable natural log.
  *
  * Spark's built-in `log`/`ln` routes through `StrictMath.log` (fdlibm) for
  * JVM-to-JVM reproducibility — but fdlibm disagrees with platform libm by
  * 1 ulp on some inputs, and DuckDB/Postgres/Trino all call libm. The
  * JDK's `java.lang.Math.log` matches this host's libm bit-for-bit on the
  * ENTIRE integer domain 1..9169 (probed exhaustively to 10⁶ including
  * after the C2 `vdlog` intrinsic kicks in: first divergence at 9170,
  * 24 total below 10⁶ — where fdlibm/StrictMath diverges 9276 times,
  * starting at 3), which covers every count this library feeds it
  * (entropy/NPMI over per-group integer counts). On NON-integer ratio
  * arguments the two round differently far more often — measured live on
  * this corpus — so callers needing cross-engine hash-parity must feed
  * integer-valued doubles and combine the lns outside (see
  * [[graft.quality.Npmi]]).
  *
  * So `portable_ln` = `Math.log`: deterministic on a fixed JVM+host, and
  * bit-identical to the DuckDB oracle where the built-in is not. It stays
  * inside WholeStageCodegen via a static call — the HotSpot intrinsic
  * makes it FASTER than the built-in's fdlibm path, not slower.
  *
  * Use it where a query's result must hash-match an external engine;
  * keep the built-in where cross-JVM bit-stability matters more than
  * cross-engine agreement.
  */
case class PortableLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_ln expects DOUBLE, got ${child.dataType.catalogString}")

  // ln(x) for x <= 0 is NaN/-Inf per Math.log — propagated as-is, the
  // caller owns the domain (counts here are >= 1); null stays null.
  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override def prettyName: String = "portable_ln"
  override protected def withNewChildInternal(
      newChild: Expression): PortableLn = copy(child = newChild)
}

object PortableLn {
  private[functions] def build(exprs: Seq[Expression]): Expression =
    exprs match {
      case Seq(c) => PortableLn(c)
      case _ => throw new IllegalArgumentException("portable_ln(col)")
    }

  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("portable_ln"),
    new ExpressionInfo(classOf[PortableLn].getName, "portable_ln"),
    build _)
}
