package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** Structured Streaming twins of the batch operators (SURVEY §2.9): the
  * incremental ingest path a 10^12-doc corpus would use. MemoryStream +
  * processAllAvailable drives them synchronously in tests. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming extraction: docs arrive incrementally, contracts accumulate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDS().map { case (id, text) => gen.Corpus.synth(id, text) }
    val contracts = pipeline.Pipeline.extract(docs).select("contract.*")
    val q = contracts.writeStream.outputMode("append")
      .format("memory").queryName("contracts_stream").start()
    try {
      stream.addData((1L, "alpha beta gamma. delta epsilon."), (2L, "one two. three four."))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM contracts_stream").head().getLong(0) == 2)
      stream.addData((3L, "more text here. and more."))
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, contract_number FROM contracts_stream ORDER BY doc_id")
        .collect()
      assert(out.length == 3)
      assert(out.forall(_.getString(1).nonEmpty))
    } finally q.stop()
  }

  test("watermarked windowed aggregation (w06 streaming twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = stream.toDS().toDF("ts", "event_type", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count("*").as("n"), sum($"value").as("sum_value"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("hourly_stream").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:45:00")
      val t2 = java.sql.Timestamp.valueOf("2024-01-01 11:10:00")
      stream.addData((t0, "click", 1.0), (t1, "click", 2.0), (t2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_type, n, sum_value FROM hourly_stream ORDER BY event_type").collect()
      assert(rows.exists(r => r.getString(0) == "click" && r.getLong(1) == 2 && r.getDouble(2) == 3.0))
      assert(rows.exists(r => r.getString(0) == "view" && r.getLong(1) == 1))
    } finally q.stop()
  }

  test("streaming session_window matches batch gap-sessionization (w10 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Spark's NATIVE sessionization: session_window(ts, gap) merges
    // events whose gaps stay under 30 min — the streaming form of
    // w10_sessions' lag + running-sum construction, with state bounded
    // by the watermark horizon
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = stream.toDS().toDF("user_id", "ts", "value")
      .withWatermark("ts", "2 hours")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count("*").as("n_events"), sum($"value").as("session_value"))
    // session-window aggregation supports append (emit once the
    // watermark passes a session's end) or complete — complete keeps the
    // test synchronous without having to advance the watermark
    val q = sessions.writeStream.outputMode("complete")
      .format("memory").queryName("sessions_stream").start()
    try {
      val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
      // user 1: events at +0, +10 (same session), +50 (gap 40 min -> new
      // session); user 2: one event
      stream.addData((1L, t(0), 1.0), (1L, t(10), 2.0), (1L, t(50), 4.0),
        (2L, t(5), 8.0))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, n_events, session_value FROM sessions_stream
          |ORDER BY user_id, session_value""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)),
        rows.mkString(","))
      // the same boundaries the batch w10 rule derives: gap <= 30 min
      // chains into one session, the 40-min gap opens a new one
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark on content key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the d01 exact-dedup streaming twin: state is bounded by the
    // watermark horizon instead of growing with the corpus — the only
    // form that survives an unbounded 10^12-doc ingest
    val stream = MemoryStream[(java.sql.Timestamp, String, String)]
    val dedup = stream.toDS().toDF("ts", "doc_id", "content_key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_key")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      stream.addData((t(0), "d1", "k-a"), (t(1), "d2", "k-a"), (t(2), "d3", "k-b"))
      q.processAllAvailable()
      stream.addData((t(3), "d4", "k-a"), (t(4), "d5", "k-c"))
      q.processAllAvailable()
      val keys = spark.sql("SELECT content_key FROM dedup_stream")
        .collect().map(_.getString(0)).sorted
      // k-a kept once (d2/d4 dropped inside the watermark), k-b, k-c kept
      assert(keys.toSeq == Seq("k-a", "k-b", "k-c"), keys.mkString(","))
    } finally q.stop()
  }

  test("file-source stream: checkpointed restart + idempotent batch sink = exactly-once ledger") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$root/in"
    val outDir = s"$root/out"
    val ck = s"$root/ck"
    val all = gen.Corpus.corpus(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.doc_id).take(40)
    val (a, b) = all.splitAt(25)
    a.toSeq.toDS().write.mode("append").parquet(inDir)
    val q1 = pipeline.StreamingPipeline.start(spark, inDir, outDir, ck)
    try q1.processAllAvailable() finally q1.stop()
    val led1 = spark.read.parquet(s"$outDir/lineage")
    assert(led1.count() == 25)
    // KILL + RESTART from the same checkpoint with new files landed:
    // committed offsets mean A's files are never re-extracted
    b.toSeq.toDS().write.mode("append").parquet(inDir)
    val q2 = pipeline.StreamingPipeline.start(spark, inDir, outDir, ck)
    try q2.processAllAvailable() finally q2.stop()
    val led2 = spark.read.parquet(s"$outDir/lineage")
    assert(led2.count() == 40, s"ledger rows ${led2.count()}")
    assert(led2.select("doc_id").distinct().count() == 40, "duplicate lineage rows after restart")
    // the streaming output IS the snapshot layout: manifests + asOf work
    val ms = graft.io.Snapshots.list(outDir)
    assert(ms.map(_.seq) == Seq(0L, 1L), ms.toString)
    assert(graft.io.Snapshots.asOf(spark, outDir, ms.last.snapshotId)
      .contracts.count() == 40)
    // sink replay (failure between sink write and offset commit): the SAME
    // batch id re-written overwrites its own partition — no duplicates
    pipeline.StreamingPipeline.writeBatch(
      pipeline.Pipeline.extract(a.toSeq.toDS()), 0L, outDir)
    val led3 = spark.read.parquet(s"$outDir/lineage")
    assert(led3.count() == 40 && led3.select("doc_id").distinct().count() == 40,
      "batch replay appended duplicates")
  }

  test("streaming incremental dedup: shards fold into the index, replay is exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-stream-dedup").toString
    val (inDir, outDir, ck) = (s"$root/in", s"$root/cands", s"$root/ck")
    val table = "mh_stream_test"
    Seq(table, s"${table}_counts", s"${table}_params")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val clone = "november oscar papa quebec romeo sierra tango uniform victor whiskey"
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val s1 = base.filter(col("doc_id") % 2 === 0)
      .union(Seq((920001L, clone)).toDF("doc_id", "text"))
    val s2 = base.filter(col("doc_id") % 2 === 1)
      .union(Seq((920002L, clone)).toDF("doc_id", "text"))
    // shard 1 lands -> batch 0 creates the index
    s1.write.mode("append").parquet(inDir)
    val q1 = pipeline.StreamingDedup.start(spark, inDir, table, outDir, ck)
    try q1.processAllAvailable() finally q1.stop()
    // kill + restart from the checkpoint; shard 2 lands -> batch 1 probes
    s2.write.mode("append").parquet(inDir)
    val q2 = pipeline.StreamingDedup.start(spark, inDir, table, outDir, ck)
    try q2.processAllAvailable() finally q2.stop()
    val b0 = spark.read.parquet(s"$outDir/batch=000000")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b1 = spark.read.parquet(s"$outDir/batch=000001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 0 = within-shard-1 pairs; batch 1 = full-corpus pairs touching
    // shard 2 (incl. the planted clone pair crossing the batch boundary)
    val full = ops.Dedup.minhashCandidates(s1.union(s2), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inS2 = (id: Long) => id % 2 == 1 || id == 920002L
    assert(b0 == full.filter(p => !inS2(p._1) && !inS2(p._2)))
    assert(b1 == full.filter(p => inS2(p._1) || inS2(p._2)))
    assert(b1.contains((920001L, 920002L)), "cross-batch clone pair missing")
    // replay batch 1 (crash between index append and offset commit): the
    // epoch exclusion + no-op append must reproduce identical outputs
    val idxRowsBefore = spark.table(table).count()
    pipeline.StreamingDedup.dedupBatch(s2.toDF(), 1L, table, outDir)
    val b1Replayed = spark.read.parquet(s"$outDir/batch=000001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1Replayed == b1, "replayed candidates differ")
    assert(spark.table(table).count() == idxRowsBefore,
      "replay double-appended index rows")
    Seq(table, s"${table}_counts", s"${table}_params")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming mix maintenance: shards fold into the stats, rates track the union, replay exactly-once") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-stream-mix").toString
    val (inDir, statsPath, outDir, ck) =
      (s"$root/in", s"$root/stats", s"$root/rates", s"$root/ck")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
    val s1 = docs.filter(col("doc_id") % 2 === 0)
    val s2 = docs.filter(col("doc_id") % 2 === 1)
    def ratesOf(dir: String): Map[String, Long] =
      spark.read.parquet(dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // shard 1 lands -> batch 0 creates the stats
    s1.write.mode("append").parquet(inDir)
    val q1 = pipeline.StreamingMix.start(spark, inDir, statsPath, outDir, ck)
    try q1.processAllAvailable() finally q1.stop()
    assert(ratesOf(s"$outDir/batch=000000") ==
      ops.Mix.rates(ops.Mix.domainStats(s1)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    // kill + restart from the checkpoint; shard 2 lands -> batch 1 appends
    s2.write.mode("append").parquet(inDir)
    val q2 = pipeline.StreamingMix.start(spark, inDir, statsPath, outDir, ck)
    try q2.processAllAvailable() finally q2.stop()
    // the published rates now equal the corpus-scan rates over the union
    val full = ops.Mix.rates(ops.Mix.domainStats(docs)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b1 = ratesOf(s"$outDir/batch=000001")
    assert(b1 == full && b1.nonEmpty)
    // replay batch 1 (crash between stats append and offset commit): the
    // dynamic-overwrite epoch + derived snapshot reproduce identical state
    val statsBefore = ops.Mix.openStats(spark, statsPath)
      .orderBy("source", "epoch").collect().toSeq
    pipeline.StreamingMix.mixBatch(s2.toDF(), 1L, statsPath, outDir)
    assert(ops.Mix.openStats(spark, statsPath)
      .orderBy("source", "epoch").collect().toSeq == statsBefore,
      "replay changed the stats")
    assert(ratesOf(s"$outDir/batch=000001") == b1, "replayed rates differ")
  }

  test("streaming LM maintenance: shards fold into the counts, scores track the union, replay exactly-once") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-stream-lm").toString
    val (inDir, lmPath, outDir, ck) =
      (s"$root/in", s"$root/lm", s"$root/scores", s"$root/ck")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    val s1 = docs.filter(col("doc_id") % 2 === 0)
    val s2 = docs.filter(col("doc_id") % 2 === 1)
    def scoresOf(dir: String): Map[Long, Double] =
      spark.read.parquet(dir).collect()
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    def expected(shard: org.apache.spark.sql.DataFrame,
                 model: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      ops.Lm.score(shard, ops.Lm.train(model)).collect()
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // shard 1 lands -> batch 0 creates the model
    s1.write.mode("append").parquet(inDir)
    val q1 = pipeline.StreamingLm.start(spark, inDir, lmPath, outDir, ck)
    try q1.processAllAvailable() finally q1.stop()
    assert(scoresOf(s"$outDir/batch=000000") == expected(s1, s1))
    // kill + restart from the checkpoint; shard 2 lands -> batch 1 appends
    s2.write.mode("append").parquet(inDir)
    val q2 = pipeline.StreamingLm.start(spark, inDir, lmPath, outDir, ck)
    try q2.processAllAvailable() finally q2.stop()
    // shard 2's published scores equal the single-build model over the union
    val b1 = scoresOf(s"$outDir/batch=000001")
    assert(b1 == expected(s2, docs) && b1.nonEmpty)
    // replay batch 1 (crash between count append and offset commit): the
    // dynamic-overwrite epoch + derived scores reproduce identical state
    val countsDir = s"${graft.io.Models.currentDir(lmPath)}/counts"
    val countsBefore = spark.read.parquet(countsDir)
      .orderBy("lang", "bg", "epoch").collect().toSeq
    pipeline.StreamingLm.lmBatch(s2.toDF(), 1L, lmPath, outDir)
    assert(spark.read.parquet(countsDir)
      .orderBy("lang", "bg", "epoch").collect().toSeq == countsBefore,
      "replay changed the counts")
    assert(scoresOf(s"$outDir/batch=000001") == b1, "replayed scores differ")
  }

  test("streaming into an outDir seeded by batch runs: seqs extend, never collide") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val outDir = java.nio.file.Files.createTempDirectory("graft-mixed-seq").toString
    val all = gen.Corpus.corpus(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").limit(20).as[graft.model.Doc].collect()
    val (a, b) = all.splitAt(10)
    // batch snapshot first (seq 0), then a stream batch lands in the SAME
    // outDir: raw batchId-as-seq would also be 0, making asOf('boot')
    // include the stream partition — time travel to the pre-stream state
    // must exclude it
    pipeline.Pipeline.run(spark, a.toSeq.toDS(), outDir, "boot")
    pipeline.StreamingPipeline.writeBatch(
      pipeline.Pipeline.extract(b.toSeq.toDS()), 0L, outDir)
    val ms = graft.io.Snapshots.list(outDir)
    assert(ms.map(m => (m.snapshotId, m.seq)) ==
      Seq(("boot", 0L), ("stream-000000", 1L)), ms.toString)
    val atBoot = graft.io.Snapshots.asOf(spark, outDir, "boot")
    assert(atBoot.contracts.filter(col("snapshot_id") =!= "boot").count() == 0)
    assert(atBoot.contracts.count() == 10)
    // replaying the stream batch keeps its seq slot (idempotent manifest)
    pipeline.StreamingPipeline.writeBatch(
      pipeline.Pipeline.extract(b.toSeq.toDS()), 0L, outDir)
    assert(graft.io.Snapshots.list(outDir).map(_.seq) == Seq(0L, 1L))
  }

  test("stateful retry queue via mapGroupsWithState (S1 streaming twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Boolean)] // (doc_id, succeeded)
    case class S(attempts: Int, terminal: Boolean)
    val updated = stream.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (id: String, events: Iterator[(String, Boolean)], state: GroupState[(Int, Boolean)]) =>
          var (attempts, done) = state.getOption.getOrElse((0, false))
          events.foreach { case (_, ok) =>
            if (!done) {
              if (ok) done = true
              else { attempts += 1; if (attempts >= 3) done = true }
            }
          }
          state.update((attempts, done))
          (id, attempts, done)
      }
    val q = updated.toDF("doc_id", "attempts", "terminal")
      .writeStream.outputMode("update").format("memory").queryName("retry_stream").start()
    try {
      stream.addData(("d1", false), ("d2", true))
      q.processAllAvailable()
      stream.addData(("d1", false), ("d1", false)) // d1 exhausts retries
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT attempts, terminal FROM retry_stream WHERE doc_id = 'd1' ORDER BY attempts DESC")
        .head()
      assert(last.getInt(0) == 3 && last.getBoolean(1))
    } finally q.stop()
  }
}
