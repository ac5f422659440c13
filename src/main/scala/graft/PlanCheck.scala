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
    for (q <- Seq("p01_title", "j04_region_rollup", "a01_pricing", "j05_pattern_match", "d03_minhash_sig",
                  "l01_reading_order", "l04_block_kinds", "x17_layout_typed",
                  "x18_decontaminate_grams", "x19_ann_pq", "x21_knn_join_lsh", "x22_seq_pack",
                  // round-4 additions: sort-free cap pairs, the composed
                  // layout extraction, graded contamination, and the
                  // served indexes (x25/x30 print the pruned cell scans)
                  "x05_minhash_pairs", "x23_layout_extract",
                  "x27_contamination_score", "x25_ann_served",
                  "x30_ann_ivfpq_served",
                  // round-5 additions: the banded/simhash oracle tiers,
                  // served batch k-NN (DPP on the bucket table),
                  // incremental shard dedup (no-shuffle corpus index),
                  // and the bloom-prefiltered decontamination
                  "d04_banded_pairs", "d13_simhash_pairs",
                  "x31_knn_join_served", "x32_incremental_dedup",
                  "x33_decontaminate_bloom",
                  // epoch-appended served k-NN corpus (probe-time cap,
                  // DPP must survive the appended layout)
                  "x35_knn_join_appended",
                  // domain mix (broadcast rates, no sort) + training
                  // shards (one exchange on shard feeds the window)
                  "d14_domain_mix", "t11_training_shards",
                  // concat-and-chunk packing (rank + prefix sum must share
                  // the one shard window)
                  "t12_packed_batches",
                  // in-engine GD training (global partial hash aggs,
                  // 1-row broadcast weight frames)
                  "t13_quality_probe",
                  // span removal (one window per doc, gh equi-joins) and
                  // the bigram LM (hash aggs to a broadcast model frame)
                  "x39_substr_dedup", "t14_lm_score",
                  // drift tier: the all-SQL alarm (multi-scan CTE chain is
                  // the ORACLE's cost; serving is x43's one-pass form) and
                  // the served alarm (broadcast model, single shard pass)
                  "x42_lm_drift", "x43_lm_drift_served")) {
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
