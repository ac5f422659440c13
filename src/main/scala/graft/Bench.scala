package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline operators on SPARK_GRAFT_SF_DIR at
  * local[SPARK_GRAFT_CPUS]. Prints ONE JSON line (driver contract).
  * The flagship metric is end-to-end extraction docs/sec on the
  * synthesized interleaved corpus (BASELINE.json north rule); per-query
  * wall times for the other headline operators ride along. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup (tiny, not timed)
    spark.range(1000).selectExpr("sum(id)").collect()
    Bench.runOnce(spark, sfDir, warm = true)
    spark.catalog.clearCache()

    val (results, docsPerSec, lshDropped) = runOnce(spark, sfDir, warm = false)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // round-3 additions timed OUTSIDE the compared queries/total set so
    // round-over-round totals stay apples-to-apples
    // min-of-3 like every other reported wall (first pass doubles as the
    // query's only warmup — it runs after clearCache)
    val (tCc, nKeepers) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = ops.Dedup.resolveNearDups(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
          threshold = 0.5)
        .filter("is_keeper = 1").count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    // layout pass (typed distributed path) and gram-hash decontamination —
    // round-3 operators, same min-of-3-with-first-pass-warmup estimator
    val (tLayout, _) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("x17_layout_typed")(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    val (tDecon, nContaminated) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("x18_decontaminate_grams")(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    // multimodal tier (round-4): real container decode throughput — GIF/PNG
    // frame extraction and WAV feature windows (same min-of-3 estimator)
    val (tFrames, nFrames) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("x12_media_frames")(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    val (tAudio, nAudio) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("x26_audio_features")(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    // training-mix tier (round-5): domain quota -> shard shuffle ->
    // concat-and-chunk packing, timed end-to-end as the t12 composition
    // (its plan contains the whole d14 + t11 chain)
    val (tMixPack, nPackRows) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("t12_packed_batches")(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    // round-5 late tier: ExactSubstr span removal and the bigram LM
    // (trained + scored in-query), same min-of-3 estimator
    val (tSubstr, _) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("x39_substr_dedup")(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    val (tLm, _) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("t14_lm_score")(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }.minBy(_._1)
    val extras = s"""{"neardup_components":${f"$tCc%.3f"},"layout_blocks":${f"$tLayout%.3f"},"decontaminate":${f"$tDecon%.3f"},"media_frames":${f"$tFrames%.3f"},"audio_features":${f"$tAudio%.3f"},"training_mix_pack":${f"$tMixPack%.3f"},"substr_dedup":${f"$tSubstr%.3f"},"lm_score":${f"$tLm%.3f"}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","docs_per_sec":${f"$docsPerSec%.1f"},"cpus":$cpus,"lsh_dropped_rows":$lshDropped,"extra_queries":$extras,"neardup_keepers":$nKeepers,"decontaminated_docs":$nContaminated,"media_frame_rows":$nFrames,"audio_feature_rows":$nAudio,"packed_rows":$nPackRows}""")
    spark.stop()
  }

  /** One pass over the headline operators; returns (name -> sec, docs/sec,
    * LSH bucket-cap dropped rows — the coverage-loss counter, 0 = full
    * candidate coverage). */
  def runOnce(spark: SparkSession, sfDir: String, warm: Boolean): (Seq[(String, Double)], Double, Long) = {
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]

    // Host CPU-steal episodes swing single-pass walls up to ~10x on this VM
    // (BENCH/BASELINE.md); every reported wall takes the min of 3 passes —
    // the least-contended sample is the only stable estimator here. The
    // warmup invocation runs each query once (JIT/codegen priming only).
    def bestOf3(f: => Long): (Double, Long) =
      (1 to (if (warm) 1 else 3)).map(_ => time(f)).minBy(_._1)

    val (tExtract, nDocs) = bestOf3 {
      pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir)).count()
    }
    out += ("extract_pipeline" -> tExtract)
    // steady-state docs/sec: 16x replicated corpus amortizes job overhead
    val (tBig, nBig) = bestOf3 {
      pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir, replicate = 16)).count()
    }
    out += ("extract_pipeline_16x" -> tBig)
    // the *With form owns the intermediate cache: unpersist (async) runs
    // as soon as the count materializes, so repeated passes never stack
    // live caches
    val (tSalted, _) = bestOf3 {
      pipeline.Pipeline.extractSaltedWith(gen.Corpus.corpus(spark, sfDir), 256)(_.count())
    }
    out += ("extract_salted" -> tSalted)
    // per-query walls are ALSO min-of-3 (since r3): the driver runs Bench
    // once per round, and a host-steal window hitting a single-pass query
    // would read as a phantom regression in the round-over-round compare
    for (q <- Seq("a01_pricing", "j02_spatial_argmax", "d03_minhash_sig",
                  "t01_langid", "v01_ann_topk", "w06_hourly")) {
      val (t, _) = bestOf3 { SparkEntry.queries(q)(spark, sfDir).count() }
      out += (q -> t)
    }
    val (tLsh, _) = bestOf3 {
      ops.Dedup.minhashCandidates(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text").count()
    }
    out += ("minhash_lsh_pairs" -> tLsh)
    // exact coverage-loss counter, measured ONCE outside the timed passes
    // (the counting form runs one extra aggregate job at call time — see
    // DropStats.cappedFilter — which must neither ride the timing nor be
    // repeated per pass)
    val dropAcc = spark.sparkContext.longAccumulator("graft.lsh_dropped")
    if (!warm) ops.Dedup.minhashCandidates(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
      droppedRows = Some(dropAcc))
    (out.toSeq, nBig / tBig, dropAcc.value)
  }
}
