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

    if (which == "audiolock") {
      // does the audio path scale with threads? If the 32-thread wall
      // matches the 1-thread wall, a JVM-global lock (AudioSystem's
      // provider registry) is serializing the executors.
      val refs = (0 until 4000).map(i => s"corpus://audio/doc-$i-0.wav")
      def oneThread(): Double = {
        val t0 = System.nanoTime()
        refs.foreach { r =>
          val b = ops.Media.WavCodec.fetchBytes(r)
          ops.Media.WavCodec.decode(b)
          ops.Media.WavCodec.features(b, 4)
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] audio 4000 clips, 1 thread: ${oneThread()}%.3f s")
      val t0 = System.nanoTime()
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          refs.slice(t * 500, (t + 1) * 500).foreach { r =>
            val b = ops.Media.WavCodec.fetchBytes(r)
            ops.Media.WavCodec.decode(b)
            ops.Media.WavCodec.features(b, 4)
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      println(f"[probe] audio 4000 clips, 8 threads: ${(System.nanoTime() - t0) / 1e9}%.3f s")

      // per-stage bisect: which stage stops scaling?
      val bytes = refs.map(ops.Media.WavCodec.fetchBytes)
      def stage(name: String)(f: Int => Unit): Unit = {
        val s0 = System.nanoTime()
        (0 until 4000).foreach(f)
        val one = (System.nanoTime() - s0) / 1e9
        val s1 = System.nanoTime()
        val ths = (0 until 8).map { t =>
          new Thread(() => (t * 500 until (t + 1) * 500).foreach(f))
        }
        ths.foreach(_.start()); ths.foreach(_.join())
        val eight = (System.nanoTime() - s1) / 1e9
        println(f"[probe] stage $name: 1t=$one%.3f s  8t=$eight%.3f s")
      }
      stage("fetchBytes")(i => { ops.Media.WavCodec.fetchBytes(refs(i)); () })
      stage("decode")(i => { ops.Media.WavCodec.decode(bytes(i)); () })
      stage("pcm")(i => { ops.Media.WavCodec.pcm(bytes(i)); () })
      stage("features")(i => { ops.Media.WavCodec.features(bytes(i), 4); () })
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
      // sub-plan split: which stage owns the wall?
      time("corpus.count")(gen.Corpus.corpus(spark, sfDir).count())
      time("audioTable.count")(
        ops.Media.audioTable(gen.Corpus.corpus(spark, sfDir)).count())
      time("audioFeatures.count")(ops.Media.audioFeatures(
        ops.Media.audioTable(gen.Corpus.corpus(spark, sfDir)), 4).count())
      time("x26 count (bench shape)")(
        SparkEntry.queries("x26_audio_features")(spark, sfDir).count())
      time("x26 count again")(
        SparkEntry.queries("x26_audio_features")(spark, sfDir).count())
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

    if (which == "neardup") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      // warm
      ops.Dedup.resolveNearDups(docs, "doc_id", "text", 0.5)
        .filter("is_keeper = 1").count()
      val cands = ops.Dedup.minhashCandidates(docs, "doc_id", "text")
      val nC = time("stage candidates.count")(cands.count())
      val verified = ops.Dedup.jaccardOnCandidates(docs,
        ops.Dedup.minhashCandidates(docs, "doc_id", "text"),
        "doc_id", "text", 0.5)
      val nV = time("stage verified.count")(verified.count())
      val cc = time("stage cc")(ops.Dedup.connectedComponents(
        ops.Dedup.jaccardOnCandidates(docs,
          ops.Dedup.minhashCandidates(docs, "doc_id", "text"),
          "doc_id", "text", 0.5), "doc_a", "doc_b").count())
      println(s"[probe] neardup stages: cands=$nC verified=$nV cc=$cc")
      time("full resolveNearDups")(
        ops.Dedup.resolveNearDups(docs, "doc_id", "text", 0.5)
          .filter("is_keeper = 1").count())
    }

    if (which == "decon") {
      val q = SparkEntry.queries("x18_decontaminate_grams")(spark, sfDir)
      time("x18 count warm")(q.count())
      time("x18 count")(SparkEntry.queries("x18_decontaminate_grams")(spark, sfDir).count())
      val docs = graft.SparkEntry.queries("t03_tokens")(spark, sfDir) // warm tables
      docs.count()
      // raw gram pipeline cost: words + grams + explode, no join
      import org.apache.spark.sql.functions._
      val base = spark.sql(s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")
      time("ctext only")(base.selectExpr("length(ctext)").agg(sum("length(ctext)")).count())
      val w = base.selectExpr("doc_id",
        "filter(split(lower(regexp_replace(ctext, '[^a-zA-Z0-9]+', ' ')), ' '), w -> length(w) > 0) AS w")
      time("words pass")(w.selectExpr("size(w)").agg(sum("size(w)")).count())
      val g = w.selectExpr("doc_id",
        "CASE WHEN size(w) >= 13 THEN transform(sequence(0, size(w) - 13), i -> xxhash64(array_join(slice(w, i + 1, 13), ' '))) ELSE CAST(array() AS array<bigint>) END AS gs")
      time("grams pass")(g.selectExpr("size(gs)").agg(sum("size(gs)")).count())
      time("grams distinct explode")(g.selectExpr("doc_id", "explode(array_distinct(gs)) AS gh").count())
      time("grams explode (no distinct)")(g.selectExpr("doc_id", "explode(gs) AS gh").count())
      time("grams explode + global distinct")(
        g.selectExpr("doc_id", "explode(gs) AS gh").distinct().count())
      time("grams array_distinct sizes only")(
        g.selectExpr("size(array_distinct(gs)) AS n").agg(sum("n")).count())
      // experiment: bench set as a broadcast HashSet + per-row count UDF
      // (no explode, no join) — compare against the join shape
      val benchGhs = g.filter("doc_id % 10 = 7")
        .selectExpr("explode(array_distinct(gs)) AS gh").distinct()
        .collect().map(_.getLong(0))
      println(s"[probe] bench gram set size: ${benchGhs.length}")
      val bcSet = spark.sparkContext.broadcast(benchGhs.toSet)
      val hits = udf((gs: Seq[Long]) => {
        val s = bcSet.value
        var n = 0
        gs.foreach(g => if (s.contains(g)) n += 1)
        n
      })
      val corpusG = g.filter("doc_id % 10 <> 7")
        .select(col("doc_id"), array_distinct(col("gs")).as("gs"))
      time("udf-probe contaminated")(
        corpusG.select(col("doc_id"), hits(col("gs")).as("n_hits"))
          .filter(col("n_hits") > 0).count())
      time("udf-probe contaminated again")(
        corpusG.select(col("doc_id"), hits(col("gs")).as("n_hits"))
          .filter(col("n_hits") > 0).count())
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
