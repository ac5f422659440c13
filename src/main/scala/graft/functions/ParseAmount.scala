package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM core of the reference's `_parse_amount`
  * (services/contract_parser.py:467-483) shared by the native expression,
  * tests, and Rules. Kept as a static-shaped object so generated Java can
  * call it directly. */
object AmountParser {
  private val Strip = java.util.regex.Pattern.compile("[R$US$USD€£\\s]")

  /** Boxed result: null = unparseable (Python except-path). */
  def parseBoxed(s: String): java.lang.Double = {
    var clean = Strip.matcher(s).replaceAll("")
    if (clean.indexOf(',') >= 0 && clean.indexOf('.') >= 0)
      clean = clean.replace(".", "").replace(",", ".")
    else if (clean.indexOf(',') >= 0)
      clean = clean.replace(",", ".")
    try java.lang.Double.valueOf(clean)
    catch { case _: NumberFormatException => null }
  }
}

/** Native Catalyst expression for the reference amount parser: codegen'd
  * (participates in whole-stage codegen — no UDF serialization, no
  * Option boxing per row), null-safe, deterministic. Demonstrates the
  * preferred extension order from the brief: built-in functions, then a
  * custom `Expression` with `doGenCode`, then UDF as last resort.
  *
  * SQL: `parse_amount(str)` after `GraftFunctions.register(spark)`;
  * Column API: `GraftFunctions.parse_amount(col)`. */
case class ParseAmount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_amount requires a string argument, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_amount"

  override def nullSafeEval(input: Any): Any =
    AmountParser.parseBoxed(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val parser = "graft.functions.AmountParser$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("parsed")
      s"""
         |java.lang.Double $boxed = $parser.parseBoxed($c.toString());
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseAmount =
    copy(child = newChild)
}

object GraftFunctions {
  /** Column-API form. */
  def parse_amount(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ParseAmount(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Register `parse_amount` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_amount", exprs => ParseAmount(exprs.head), "built-in")
}
