package graft

import org.apache.spark.sql.SparkSession

/** End-to-end driver for the extraction engine: synthesize the interleaved
  * corpus from a sf dir, run the full pipeline (boilerplate strip -> block
  * parse -> lineage -> manifest), print a summary. Usage:
  *   runMain graft.Demo <sfDir> <outDir>
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-demo"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = gen.Corpus.corpus(spark, sfDir)
    val (ok, err) = pipeline.Pipeline.run(spark, docs, outDir, "demo-snap")
    println(s"[demo] docs ok=$ok err=$err out=$outDir")
    val contracts = spark.read.parquet(s"$outDir/contracts")
    contracts.select("contract.doc_id", "contract.contract_number",
        "contract.contract_type", "contract.currency",
        "contract.effective_date", "contract.client_name")
      .show(5, truncate = false)
    contracts.groupBy("contract.contract_type").count().orderBy("contract_type").show()
    spark.stop()
  }
}
