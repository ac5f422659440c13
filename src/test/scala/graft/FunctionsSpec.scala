package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.extract.Rules

/** Native `parse_amount` Catalyst expression: value parity with the pure
  * Rules implementation, null behavior, codegen participation, and SQL
  * registration. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val cases = Seq("R$ 150.000,00", "US$ 50,000.00", "€ 25.000,00",
    "150.000,00", "25,5", "invalid", "", "R$ 6.250,00", "1234")

  test("expression == Rules.parseAmount on all fixture cases") {
    import spark.implicits._
    val df = cases.toDF("s")
      .withColumn("v", GraftFunctions.parse_amount(col("s")))
    val got = df.collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got.toSeq == cases.map(Rules.parseAmount))
  }

  test("SQL registration + whole-stage codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = cases.toDF("s").selectExpr("parse_amount(s) AS v")
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
      == cases.map(Rules.parseAmount))
    // the expression must live inside a WholeStageCodegen span (not a UDF
    // black box) — a parquet-backed plan shows the codegen stage (the
    // local-relation variant above gets constant-folded entirely, which
    // itself proves interpreted eval works)
    val pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("parse_amount(CAST(n_chars AS STRING) || ',5') AS v")
    val plan = pq.queryExecution.executedPlan.toString
    // '*(n)' marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [parse_amount"), plan)
    assert(pq.where(col("v").isNull).count() == 0)
  }

  test("Python float() parity on edge literals (live-ref _parse_amount goldens)") {
    import graft.functions.AmountParser.parseBoxed
    // captured from the running reference: _parse_amount('1d') -> None,
    // '0x1p3' -> None (Java Double.valueOf would accept both), '1_000' ->
    // 1000.0 (Java would reject), 'Infinity' -> inf, 'NaN' -> nan
    assert(parseBoxed("1d") == null)
    assert(parseBoxed("1f") == null)
    assert(parseBoxed("0x1p3") == null)
    assert(parseBoxed("1_000") == 1000.0)
    assert(parseBoxed("Infinity") == Double.PositiveInfinity)
    assert(parseBoxed("NaN").isNaN)
    assert(parseBoxed("1.") == 1.0)
    assert(parseBoxed(".5") == 0.5)
    assert(parseBoxed("1e3") == 1000.0)
    assert(parseBoxed("1,2,3") == null)
    assert(parseBoxed("") == null)
    assert(parseBoxed("150.000,00") == 150000.0)
    assert(parseBoxed("US$ 50,000.00") == 50.0) // the pinned reference quirk
  }

  test("null input -> null output") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("25,5")).toDF("s")
      .withColumn("v", GraftFunctions.parse_amount(col("s")))
    val rows = df.collect()
    assert(rows(0).isNullAt(1) && rows(1).getDouble(1) == 25.5)
  }
}
