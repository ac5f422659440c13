package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement probe for the r7 optimization round (not part of
  * the driver contract): runtime plan-reuse checks + per-stage micro
  * timings for the media/audio codecs. */
object ProbeR07 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (which == "all" || which == "mh") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val df = ops.Dedup.minhashCandidates(docs, "doc_id", "text")
      time("minhash_lsh_pairs warm1")(df.count())
      val exec = df.queryExecution.executedPlan.toString
      val reused = "ReusedExchange|StageReuse|table cache".r
        .findAllIn(exec).length
      val scans = "Scan parquet".r.findAllIn(exec).length
      println(s"[probe] minhash executed plan: $scans scans, $reused reuse markers")
      val df2 = ops.Dedup.minhashCandidates(docs, "doc_id", "text")
      time("minhash_lsh_pairs warm2")(df2.count())
    }

    if (which == "all" || which == "audio") {
      // per-stage micro timing of the audio path, single-threaded sample
      val refs = (0 until 500).map(i => s"corpus://audio/doc-$i-0.wav")
      time("audio fetchBytes x500") {
        refs.foreach(ops.Media.WavCodec.fetchBytes)
      }
      val bytes = refs.map(ops.Media.WavCodec.fetchBytes)
      time("audio decode x500")(bytes.foreach(ops.Media.WavCodec.decode))
      time("audio pcm x500")(bytes.foreach(ops.Media.WavCodec.pcm))
      time("audio features x500")(bytes.foreach(b => ops.Media.WavCodec.features(b, 4)))
      time("x26 full")(SparkEntry.queries("x26_audio_features")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }

    if (which == "all" || which == "media") {
      val refs = (0 until 300).map(i => s"corpus://img/$i-0.jpg")
      time("img fetchBytes x300") {
        refs.foreach(ops.Media.ImageIoCodec.fetchBytes)
      }
      val bytes = refs.map(ops.Media.ImageIoCodec.fetchBytes)
      time("img decode x300")(bytes.foreach(ops.Media.ImageIoCodec.decode))
      time("img framesDecoded x300")(bytes.foreach(b =>
        ops.Media.ImageIoCodec.framesDecoded(b, n => Seq(0))))
      time("x12 full")(SparkEntry.queries("x12_media_frames")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }

    if (which == "extract") {
      // single-threaded micro split of the per-doc extraction cost
      val seeds = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").limit(2000)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      time("synth x2000")(seeds.foreach { case (id, t) => gen.Corpus.synth(id, t) })
      val docs = seeds.map { case (id, t) => gen.Corpus.synth(id, t) }
      time("stripBoilerplate x2000")(docs.foreach(d =>
        extract.Extract.stripBoilerplate(d.spans)))
      val stripped = docs.map(d => (d.doc_id, extract.Extract.stripBoilerplate(d.spans)))
      time("parseBlocks x2000")(stripped.foreach { case (id, sp) =>
        extract.Extract.parseBlocks(id, sp) })
      time("extract_16x full")(pipeline.Pipeline.extract(
        gen.Corpus.corpus(spark, sfDir, replicate = 16)).count())
    }

    if (which == "all" || which == "extras") {
      for (q <- Seq("x17_layout_typed", "x18_decontaminate_grams",
                    "x39_substr_dedup", "t12_packed_batches", "t14_lm_score",
                    "j02_spatial_argmax")) {
        val df = SparkEntry.queries(q)(spark, sfDir)
        time(s"$q pass1")(df.write.format("noop").mode("overwrite").save())
        time(s"$q pass2")(SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      time("neardup_components pass1")(
        ops.Dedup.resolveNearDups(docs, "doc_id", "text", 0.5)
          .filter("is_keeper = 1").count())
      time("neardup_components pass2")(
        ops.Dedup.resolveNearDups(docs, "doc_id", "text", 0.5)
          .filter("is_keeper = 1").count())
    }
    spark.stop()
  }
}
