package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("d14_domain_mix")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan
    val exs = plan.collectWithSubqueries { case e: ShuffleExchangeExec => e }
    println("shuffle exchanges found: " + exs.size)
    for (i <- exs.indices; j <- exs.indices if i < j) {
      println(s"ex$i == ex$j canonical: " + (exs(i).canonicalized == exs(j).canonicalized))
    }
    exs.zipWithIndex.foreach { case (e, i) =>
      println(s"--- ex$i canonicalized ---")
      println(e.canonicalized.treeString.take(2500))
    }
    spark.stop()
  }
}
