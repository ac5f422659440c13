package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline operators on SPARK_GRAFT_SF_DIR at
  * local[SPARK_GRAFT_CPUS]. Prints ONE JSON line (driver contract).
  * The flagship metric is end-to-end extraction docs/sec on the
  * synthesized interleaved corpus (BASELINE.json north rule); per-query
  * wall times for the other headline operators ride along.
  *
  * SELF-ADJUDICATING artifacts (round 6): host CPU-steal episodes swing
  * walls up to ~20x on this VM, and a single min-of-3 number can't be
  * classified after the fact (BENCH_r05.json shipped layout_blocks at
  * 18.27 s — 22x the clean number — and only a judge-side rerun told
  * window noise from regression). So the JSON now carries the RAW
  * per-pass wall list for every query (`passes`) and an `anomalies`
  * list flagging any min-of-3 that lands >2x its documented
  * clean-window high (the ranges tabulated in BENCH/BASELINE.md,
  * applied only under driver conditions: sf0.1, 32 cpus). A
  * window-contaminated run is classifiable from the artifact alone:
  * the steal signature is a huge pass-to-pass spread (e.g. 18.3/2.1/
  * 0.9) on an unchanged plan, vs a regression's consistent walls. */
object Bench {

  /** Documented clean-window HIGH water mark per query (seconds, sf0.1
    * local[32], min-of-3) — from the clean-window samples recorded in
    * BENCH/BASELINE.md rounds 3–5. A min-of-3 above 2x these is flagged
    * as anomalous in the emitted JSON. neardup_components uses its
    * pass-2/3 warmup-tail class (steady state 2.25, warmup class 3.3). */
  val CleanHi: Map[String, Double] = Map(
    "extract_pipeline" -> 0.5,
    "extract_pipeline_16x" -> 1.1,
    "extract_salted" -> 1.2,
    "a01_pricing" -> 0.4,
    "j02_spatial_argmax" -> 1.7,
    "d03_minhash_sig" -> 0.35,
    "t01_langid" -> 0.3,
    "v01_ann_topk" -> 0.5,
    "w06_hourly" -> 0.4,
    "minhash_lsh_pairs" -> 1.3,
    "neardup_components" -> 3.4,
    "layout_blocks" -> 2.5,
    "decontaminate" -> 1.9,
    "media_frames" -> 1.8,
    "audio_features" -> 3.3,
    "training_mix_pack" -> 0.7,
    "substr_dedup" -> 0.5,
    "lm_score" -> 0.4)

  /** All pass walls recorded per query, in execution order. */
  private val passLog =
    scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]

  /** min-of-3 with the raw pass list retained for the artifact. The
    * first pass doubles as the query's only warmup. */
  private def bestOf3[A](name: String, passes: Int = 3)(f: => A): (Double, A) = {
    val runs = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    passLog(name) = runs.map(_._1)
    runs.minBy(_._1)
  }

  private def jNum(v: Double): String = f"$v%.3f"

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

    // JVM/codegen warmup (tiny, not timed) — but the WALL is recorded:
    // a steal episode during warmup is itself a window signature
    spark.range(1000).selectExpr("sum(id)").collect()
    val w0 = System.nanoTime()
    runOnce(spark, sfDir, warm = true)
    val warmupWall = (System.nanoTime() - w0) / 1e9
    spark.catalog.clearCache()
    passLog.clear() // keep only measured passes in the artifact

    val (results, docsPerSec, lshDropped) = runOnce(spark, sfDir, warm = false)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + jNum(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // round-3+ additions timed OUTSIDE the compared queries/total set so
    // round-over-round totals stay apples-to-apples; same min-of-3
    // estimator (first pass doubles as the query's only warmup — it runs
    // after clearCache)
    val (tCc, nKeepers) = bestOf3("neardup_components") {
      ops.Dedup.resolveNearDups(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
          threshold = 0.5)
        .filter("is_keeper = 1").count()
    }
    val (tLayout, _) = bestOf3("layout_blocks") {
      SparkEntry.queries("x17_layout_typed")(spark, sfDir).count()
    }
    val (tDecon, nContaminated) = bestOf3("decontaminate") {
      SparkEntry.queries("x18_decontaminate_grams")(spark, sfDir).count()
    }
    // multimodal tier (round-4): real container decode throughput — GIF/PNG
    // frame extraction and WAV feature windows
    val (tFrames, nFrames) = bestOf3("media_frames") {
      SparkEntry.queries("x12_media_frames")(spark, sfDir).count()
    }
    val (tAudio, nAudio) = bestOf3("audio_features") {
      SparkEntry.queries("x26_audio_features")(spark, sfDir).count()
    }
    // training-mix tier (round-5): domain quota -> shard shuffle ->
    // concat-and-chunk packing, timed end-to-end as the t12 composition
    // (its plan contains the whole d14 + t11 chain)
    val (tMixPack, nPackRows) = bestOf3("training_mix_pack") {
      SparkEntry.queries("t12_packed_batches")(spark, sfDir).count()
    }
    // round-5 late tier: ExactSubstr span removal and the bigram LM
    val (tSubstr, _) = bestOf3("substr_dedup") {
      SparkEntry.queries("x39_substr_dedup")(spark, sfDir).count()
    }
    val (tLm, _) = bestOf3("lm_score") {
      SparkEntry.queries("t14_lm_score")(spark, sfDir).count()
    }
    val extras = Seq(
      "neardup_components" -> tCc, "layout_blocks" -> tLayout,
      "decontaminate" -> tDecon, "media_frames" -> tFrames,
      "audio_features" -> tAudio, "training_mix_pack" -> tMixPack,
      "substr_dedup" -> tSubstr, "lm_score" -> tLm)
    val extrasJson = extras
      .map { case (k, v) => "\"" + k + "\":" + jNum(v) }
      .mkString("{", ",", "}")
    // anomaly adjudication: driver conditions only — the documented
    // clean ranges are sf0.1/local[32] numbers
    val driverConditions = sfDir.endsWith("sf0.1") && cpus == "32"
    val anomalies: Seq[String] =
      if (!driverConditions) Seq.empty
      else (results ++ extras).collect {
        case (k, v) if CleanHi.get(k).exists(hi => v > 2 * hi) =>
          val ps = passLog.getOrElse(k, Seq(v)).map(jNum).mkString("/")
          s"$k=${jNum(v)}s >2x clean-high ${jNum(CleanHi(k))}s (passes $ps)"
      }
    anomalies.foreach(a => System.err.println(
      s"[bench] ANOMALY (window noise vs regression — read the passes): $a"))
    val passesJson = passLog
      .map { case (k, ps) => "\"" + k + "\":" + ps.map(jNum).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val anomaliesJson = anomalies
      .map(a => "\"" + a.replace("\"", "'") + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","docs_per_sec":${f"$docsPerSec%.1f"},"cpus":$cpus,"lsh_dropped_rows":$lshDropped,"extra_queries":$extrasJson,"neardup_keepers":$nKeepers,"decontaminated_docs":$nContaminated,"media_frame_rows":$nFrames,"audio_feature_rows":$nAudio,"packed_rows":$nPackRows,"warmup_wall":${jNum(warmupWall)},"passes":$passesJson,"anomalies":$anomaliesJson}""")
    spark.stop()
  }

  /** One pass over the headline operators; returns (name -> sec, docs/sec,
    * LSH bucket-cap dropped rows — the coverage-loss counter, 0 = full
    * candidate coverage). Every reported wall takes the min of 3 passes
    * (host steal swings single passes ~10x; the least-contended sample is
    * the only stable estimator here), and all raw passes land in the
    * emitted artifact. */
  def runOnce(spark: SparkSession, sfDir: String, warm: Boolean): (Seq[(String, Double)], Double, Long) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val passes = if (warm) 1 else 3

    val (tExtract, _) = bestOf3("extract_pipeline", passes) {
      pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir)).count()
    }
    out += ("extract_pipeline" -> tExtract)
    // steady-state docs/sec: 16x replicated corpus amortizes job overhead
    val (tBig, nBig) = bestOf3("extract_pipeline_16x", passes) {
      pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir, replicate = 16)).count()
    }
    out += ("extract_pipeline_16x" -> tBig)
    // the *With form owns the intermediate cache: unpersist (async) runs
    // as soon as the count materializes, so repeated passes never stack
    // live caches
    val (tSalted, _) = bestOf3("extract_salted", passes) {
      pipeline.Pipeline.extractSaltedWith(gen.Corpus.corpus(spark, sfDir), 256)(_.count())
    }
    out += ("extract_salted" -> tSalted)
    for (q <- Seq("a01_pricing", "j02_spatial_argmax", "d03_minhash_sig",
                  "t01_langid", "v01_ann_topk", "w06_hourly")) {
      val (t, _) = bestOf3(q, passes) { SparkEntry.queries(q)(spark, sfDir).count() }
      out += (q -> t)
    }
    val (tLsh, _) = bestOf3("minhash_lsh_pairs", passes) {
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
