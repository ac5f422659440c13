package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Maintenance, StreamingCuration}

/** The single maintenance window: one call compacts every serving table
  * a curation state names, probes are byte-identical across it, and a
  * replay of a folded epoch refuses loudly (the interlock the
  * quiescence contract promises). */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_maint_${tag}_${System.nanoTime()}").getAbsolutePath

  test("one window compacts all named tables; probes byte-identical; folded-epoch replay refuses") {
    val table = "mh_maint_spec"; val gtable = "gx_maint_spec"
    (Seq(table, s"${table}_counts", s"${table}_params") ++
      Seq(gtable, s"${gtable}_params", s"${gtable}_epochs"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ix = Curation.Indexes(minhashTable = table, statsPath = tmp("stats"),
      modelPath = tmp("model"), lmPath = tmp("lm"),
      gramTable = Some(gtable))
    val corpusPath = tmp("corpus")
    val outDir = tmp("out")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"), col("lang"))
    val corpus = docs.filter(col("doc_id") < 300)
    StreamingCuration.bootstrap(corpus, ix, corpusPath, requireScrub = true)
    val bench = Seq("unrelated benchmark snippet never matching anything")
      .toDF("snippet")

    // two committed batches grow epochs 1 and 2 in every accept-fed table
    val b0 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 350)
    val b1 = docs.filter(col("doc_id") >= 350 && col("doc_id") < 400)
    StreamingCuration.curateBatch(b0, 0L, ix, corpusPath, outDir,
      bench, "snippet")
    StreamingCuration.curateBatch(b1, 1L, ix, corpusPath, outDir,
      bench, "snippet")

    // a read-only probe shard: decisions captured before the window
    val probeShard = docs.filter(col("doc_id") >= 400 && col("doc_id") < 440)
    def probe(): Seq[(Long, String, Int)] = {
      val scrubbed = Curation.scrubShard(spark, probeShard, ix)
      Curation.curateShard(spark, scrubbed,
          StreamingCuration.openCorpus(spark, corpusPath).drop("epoch"),
          ix, bench, "snippet")
        .select(col("doc_id"), col("decision"), col("n_copies"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sortBy(_._1).toSeq
    }
    val pre = probe()
    assert(pre.nonEmpty)

    // ONE call compacts everything the state names
    val folds = Maintenance.run(spark, ix, corpusPath = Some(corpusPath))
    val byTable = folds.map(f => f.table -> f.foldPoint).toMap
    assert(byTable.keySet == Set("minhash_index", "mix_stats", "lm_counts",
      "gram_index", "corpus", "probe_model", "lm_model"), byTable.toString)
    // accept-fed tables folded both batch epochs; the LM counts are
    // bootstrap-only in this loop (retrain-only state) — never folded
    // reads -1 in the cells-layout convention
    for (t <- Seq("minhash_index", "mix_stats", "gram_index", "corpus"))
      assert(byTable(t) == 2L, s"$t fold point ${byTable(t)}")
    assert(byTable("lm_counts") == -1L, byTable.toString)
    // model roots report the surviving (current) version: v0, no retrain
    // has happened in this loop
    assert(byTable("probe_model") == 0L, byTable.toString)
    assert(byTable("lm_model") == 0L, byTable.toString)

    // probes across the window are byte-identical
    assert(probe() == pre, "probe diverged across the maintenance window")

    // the quiescence interlock: replaying a FOLDED epoch refuses loudly
    // instead of corrupting the baseline (this is the documented crash
    // mode of compacting while a batch was uncommitted)
    val e = intercept[Exception] {
      StreamingCuration.curateBatch(b1, 1L, ix, corpusPath, outDir,
        bench, "snippet")
    }
    assert(e.getMessage != null && e.getMessage.contains("folded"),
      e.toString)
    // the refused replay wrote nothing: probes still byte-identical
    assert(probe() == pre, "refused replay mutated serving state")

    // a second window is a no-op at the same fold points
    val folds2 = Maintenance.run(spark, ix, corpusPath = Some(corpusPath))
    assert(folds2.map(f => f.table -> f.foldPoint).toMap == byTable)

    (Seq(table, s"${table}_counts", s"${table}_params") ++
      Seq(gtable, s"${gtable}_params", s"${gtable}_epochs"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
