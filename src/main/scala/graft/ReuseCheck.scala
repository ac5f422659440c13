package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev-loop exchange audit: list a query's shuffle exchanges and whether
  * any pair is canonically equal (reusable). Reads executedPlan — sparkPlan
  * predates EnsureRequirements, so it never contains exchanges. With AQE
  * on, exchanges live inside AdaptiveSparkPlanExec; disable it here so the
  * static plan exposes them to collectWithSubqueries.
  * Usage: runMain graft.ReuseCheck <queryName> [sfDir] */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d14_domain_mix")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan
    val exs = plan.collectWithSubqueries { case e: ShuffleExchangeExec => e }
    println(s"shuffle exchanges found: ${exs.size}")
    for (i <- exs.indices; j <- exs.indices if i < j)
      println(s"ex$i == ex$j canonical: " + (exs(i).canonicalized == exs(j).canonicalized))
    exs.zipWithIndex.foreach { case (e, i) =>
      println(s"--- ex$i ---")
      println(e.outputPartitioning)
    }
    spark.stop()
  }
}
