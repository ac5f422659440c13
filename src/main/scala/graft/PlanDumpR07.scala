package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for every bench-path query into a
  * directory (default plans/r07) with a suffix (default "before") — the
  * optimization round's evidence trail. Not part of the driver contract.
  *
  * Usage: runMain graft.PlanDumpR07 [sfDir] [outDir] [suffix]
  */
object PlanDumpR07 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r07"
    val suffix = if (args.length > 2) args(2) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def dump(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val text =
        try df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Exception => s"PLAN FAILED: ${e.getMessage}" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), text)
      println(s"dumped $name")
    }

    // headline bench queries (same bodies Bench times)
    dump("extract_pipeline",
      pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir)).toDF())
    for (q <- Seq("a01_pricing", "j02_spatial_argmax", "d03_minhash_sig",
                  "t01_langid", "v01_ann_topk", "w06_hourly",
                  // extra_queries bodies
                  "x17_layout_typed", "x18_decontaminate_grams",
                  "x12_media_frames", "x26_audio_features",
                  "t12_packed_batches", "x39_substr_dedup", "t14_lm_score"))
      dump(q, SparkEntry.queries(q)(spark, sfDir))
    dump("minhash_lsh_pairs",
      ops.Dedup.minhashCandidates(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text"))
    // neardup_components is iterative (CC rounds); its stable prefix is the
    // candidates->jaccard stage — dump that as the plan evidence
    dump("neardup_jaccard_stage", {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val cands = ops.Dedup.minhashCandidates(docs, "doc_id", "text")
      ops.Dedup.jaccardOnCandidates(docs, cands, "doc_id", "text", 0.5)
    })
    spark.stop()
  }
}
