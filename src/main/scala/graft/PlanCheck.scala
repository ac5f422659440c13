package graft
import org.apache.spark.sql.SparkSession
/** Prints formatted plans for key queries so partitioning/pushdown
  * regressions are visible. Not part of the driver contract. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("p01_title", "j04_region_rollup", "a01_pricing", "j05_pattern_match", "d03_minhash_sig")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    println("===== extract_pipeline =====")
    println(pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
