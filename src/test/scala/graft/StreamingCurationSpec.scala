package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, StreamingCuration}

/** The full curation loop as a checkpointed stream: shards arrive as
  * files, decisions + funnel land per batch, keepers fold into ALL
  * serving state (index, stats, corpus text) so the NEXT batch catches
  * their clones; a killed-and-restarted stream resumes from the
  * checkpoint, and a crashed batch's replay is byte-identical. */
class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_scur_${tag}_${System.nanoTime()}").getAbsolutePath

  test("streaming curation: decisions per batch, accepts grow every serving table, restart + replay exactly-once") {
    val table = "mh_stream_curation"
    Seq(table, s"${table}_counts", s"${table}_params")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ix = Curation.Indexes(minhashTable = table,
      statsPath = tmp("stats"), modelPath = tmp("model"), lmPath = tmp("lm"))
    val corpusPath = tmp("corpus")
    val inDir = tmp("in"); val outDir = tmp("out"); val ck = tmp("ck")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"), col("lang"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    StreamingCuration.bootstrap(corpus, ix, corpusPath)

    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliett kilo lima mike november oscar papa"
    val bench = Seq(benchText).toDF("snippet")
    val longKeep = ("steady quality words with punctuation, present often. " * 8) +
      "This keeps length over the gate floor and token count high enough."
    val keepSix = "Completely separate vocabulary appears within this " +
      "lengthy paragraph. Rivers meander through quiet valleys while amber " +
      "sunsets describe patient horizons. Gentle travelers navigate winding " +
      "pathways beneath ancient cedar branches, collecting memorable stories " +
      "during tranquil evenings beside glowing lanterns."
    val keepFollow = "Another fully independent passage concerning harbors: " +
      "lighthouses signal distant vessels while fishermen repair woven nets " +
      "along weathered docks. Seasonal markets gather merchants, musicians, " +
      "bakers offering warm loaves, plus carpenters displaying oak furniture " +
      "crafted throughout winter months."
    val keepDomain = "Mountain observatories record constellations nightly; " +
      "astronomers chart drifting planets, calibrate brass instruments, and " +
      "publish careful tables for navigators. Morning frost settles over " +
      "telescope domes while librarians archive yesterday's measurements " +
      "beside steaming copper kettles."

    // batch 0: every in-shard decision branch
    val s1 = Seq(
      (900001L, longKeep + " clone body one two three", "web", "en"),
      (900002L, longKeep + " clone body one two three", "web", "en"), // exact dup
      (900004L, benchText + " " + longKeep, "web", "en"),             // contaminated
      (900005L, "tiny junk", "web", "en"),                            // low quality
      (900006L, keepSix, "brand-new-domain", "en"),                   // keep, unseen domain
      // consonant salad that PASSES the heuristic gate; only the LM's
      // out-of-distribution cut rejects it (and feeds the drift row)
      (900007L, ("xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq " +
        "zqxk jqvz ") * 4, "web", "en")
    ).toDF("doc_id", "text", "source", "lang")
    s1.write.mode("append").parquet(inDir)
    val q1 = StreamingCuration.start(spark, inDir, ix, corpusPath, outDir,
      ck, bench, "snippet")
    try q1.processAllAvailable() finally q1.stop()

    val d0 = spark.read.parquet(s"$outDir/batch=000000/decisions")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    assert(d0(900002L)._1 == "exact_dup" && d0(900002L)._2 == 0)
    assert(d0(900001L)._1 == "keep")
    assert(d0(900004L)._1 == "contaminated")
    assert(d0(900005L)._1 == "low_quality")
    assert(d0(900006L)._1 == "keep" && d0(900006L)._2 >= 1,
      d0(900006L).toString) // unseen domain defaults to one copy
    assert(d0(900007L)._1 == "gibberish" && d0(900007L)._2 == 0,
      d0(900007L).toString)
    val funnel0 = spark.read.parquet(s"$outDir/batch=000000/funnel")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel0 == d0.values.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
    // the batch's own drift row: the planted gibberish doc puts 'en'
    // below its cut, so the loop's retrain alarm carries a non-zero count
    val drift0 = spark.read.parquet(s"$outDir/batch=000000/drift")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(drift0("en") >= 1L, drift0.toString)
    // the probe's alarm row lands beside it — and equals a hand
    // computation against the served model (same parity bar as the LM
    // row in the quiescence test: the cloned foreachBatch session must
    // have read the same pointer). NOTE: the hand rows run on the RAW
    // batch (s1) while the stream computes on the scrubbed shard — equal
    // only because this fixture configures NO gramTable, so scrubShard
    // is a pass-through; a gram index here would make this compare a
    // different invariant (compute the hand rows from Curation.scrubShard
    // if that ever changes).
    val pdrift0 = spark.read.parquet(s"$outDir/batch=000000/probe_drift").head()
    assert(pdrift0.getAs[Long]("n_docs") == 6L, pdrift0.toString)
    val pdriftHand = graft.ops.Probe.driftStats(s1.toDF(),
      graft.ops.Probe.openModel(spark, ix.modelPath)).head()
    assert(pdrift0.toString == pdriftHand.toString,
      s"stream probe drift != hand computation:\n$pdrift0\n$pdriftHand")

    // the accept grew every serving table by exactly the keepers
    val nKeep0 = d0.values.count(_._1 == "keep")
    assert(StreamingCuration.openCorpus(spark, corpusPath)
      .filter(col("epoch").cast("long") === 1L).count() == nKeep0)
    assert(spark.table(s"${table}_counts")
      .filter(col("epoch") === 1L).limit(1).count() > 0)
    assert(graft.ops.Mix.openStats(spark, ix.statsPath)
      .filter(col("source") === "brand-new-domain").count() == 1)

    // batch 1 after a KILL + RESTART from the checkpoint: a clone of a
    // batch-0 keeper must lose to the index that keeper was folded into,
    // and the once-unseen domain now has real mix rates
    val s2 = Seq(
      (910001L, keepSix, "brand-new-domain", "en"),  // clone of accepted 900006
      (910002L, keepFollow, "web", "en"),            // fresh keep
      (910004L, keepDomain, "brand-new-domain", "en") // keep, domain now in stats
    ).toDF("doc_id", "text", "source", "lang")
    s2.write.mode("append").parquet(inDir)
    val q2 = StreamingCuration.start(spark, inDir, ix, corpusPath, outDir,
      ck, bench, "snippet")
    try q2.processAllAvailable() finally q2.stop()

    val d1 = spark.read.parquet(s"$outDir/batch=000001/decisions")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    assert(d1(910001L)._1 == "near_dup", d1.toString)
    assert(d1(910002L)._1 == "keep")
    // per-batch lineage manifests: epoch identity, counts, and a zero
    // drop count (no viral buckets in these shards)
    val m0 = spark.read.parquet(s"$outDir/batch=000000/manifest").head()
    assert(m0.getLong(1) == 1L && m0.getLong(2) == 6L &&
      m0.getLong(3) == nKeep0 && m0.getLong(4) == 0L, m0.toString)
    val m1 = spark.read.parquet(s"$outDir/batch=000001/manifest").head()
    assert(m1.getLong(1) == 2L && m1.getLong(2) == 3L &&
      m1.getLong(4) == 0L, m1.toString)
    // 910004's copies now come from REAL rates (its domain was folded in
    // at batch 0), not the unseen-domain default — the rate may round to
    // 0 or upsample, so pin only the decision here; the stats-row check
    // above pins that the domain entered the mix
    assert(d1(910004L)._1 == "keep", d1.toString)

    // replay batch 1 (crash between the accept appends and the offset
    // commit): epoch exclusion on index + stats + corpus must reproduce
    // identical decisions, and the epoch appends must not double
    val corpusRows = StreamingCuration.openCorpus(spark, corpusPath).count()
    // the stream's appends ran in a CLONED session — re-list before
    // baselining this session's view (the library paths refresh
    // themselves; this count is a raw table read)
    spark.catalog.refreshTable(table)
    val idxRows = spark.table(table).count()
    val statsRows = graft.ops.Mix.openStats(spark, ix.statsPath).count()
    StreamingCuration.curateBatch(s2.toDF(), 1L, ix, corpusPath, outDir,
      bench, "snippet")
    val d1r = spark.read.parquet(s"$outDir/batch=000001/decisions")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    assert(d1r == d1, "replayed decisions differ")
    assert(StreamingCuration.openCorpus(spark, corpusPath).count() == corpusRows,
      "replay double-appended corpus rows")
    assert(spark.table(table).count() == idxRows,
      "replay double-appended index rows")
    assert(graft.ops.Mix.openStats(spark, ix.statsPath).count() == statsRows,
      "replay double-appended stats rows")

    // batch 2 through a restart with maxBucket=1: every shard-touched
    // bucket is over cap, so the clone pair below is MISSED — and the
    // manifest's dropped_candidate_rows is the loud signal of exactly
    // that coverage loss (the silent-cap failure mode, surfaced)
    val viralA = "Identical viral passage replicated across the shard " +
      "describing carnival processions, confetti cascades, brass bands " +
      "parading boulevards, and vendors selling caramel apples nightly."
    val s3 = Seq(
      (920001L, viralA, "web", "en"),
      (920002L, viralA, "web", "en"),
      (920003L, "Leading variant words here. " + viralA, "web", "en")
    ).toDF("doc_id", "text", "source", "lang")
    s3.write.mode("append").parquet(inDir)
    val q3 = StreamingCuration.start(spark, inDir, ix, corpusPath, outDir,
      ck, bench, "snippet", maxBucket = 1)
    try q3.processAllAvailable() finally q3.stop()
    val m2 = spark.read.parquet(s"$outDir/batch=000002/manifest").head()
    assert(m2.getLong(1) == 3L && m2.getLong(4) > 0L,
      s"viral-bucket drop count not surfaced: $m2")
    val d2 = spark.read.parquet(s"$outDir/batch=000002/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 920002 escapes the near-dup tier (candidates capped away) but the
    // in-shard EXACT tier still catches the verbatim clone; 920003's
    // near-clone is the one the cap genuinely loses
    assert(d2(920002L) == "exact_dup", d2.toString)
    assert(d2(920003L) == "keep", d2.toString)
    Seq(table, s"${table}_counts", s"${table}_params")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("gram-scrub loop: boilerplate cut before decisions, accepts extend the scrub, replay exact") {
    val table = "mh_scur_scrub"; val gtable = "gx_scur_scrub"
    (Seq(table, s"${table}_counts", s"${table}_params") ++
      Seq(gtable, s"${gtable}_params", s"${gtable}_epochs"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ix = Curation.Indexes(minhashTable = table,
      statsPath = tmp("sstats"), modelPath = tmp("smodel"),
      lmPath = tmp("slm"), gramTable = Some(gtable))
    val corpusPath = tmp("scorpus")
    val inDir = tmp("sin"); val outDir = tmp("sout"); val ck = tmp("sck")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"), col("lang"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    StreamingCuration.bootstrap(corpus, ix, corpusPath)
    val bench = Seq("unrelated benchmark snippet never matching anything")
      .toDF("snippet")

    // a 20-word span straight out of an indexed corpus doc = boilerplate
    val boiler = corpus.orderBy("doc_id").select("text").as[String].head()
      .split(" ").take(20).mkString(" ")
    val unique = "Entirely novel narration follows describing observatory " +
      "routines: astronomers calibrate brass instruments nightly, chart " +
      "drifting planets patiently, and archive careful measurements beside " +
      "steaming copper kettles while morning frost settles over the domes."
    val freshB1 = "Harbor chronicles continue independently: lighthouses " +
      "signal distant vessels while fishermen repair woven nets along " +
      "weathered docks, and seasonal markets gather merchants, musicians, " +
      "and bakers offering warm loaves throughout winter months."

    // batch 0: doc A carries corpus boilerplate + unique content
    val s1 = Seq((930001L, boiler + " " + unique, "web", "en"))
      .toDF("doc_id", "text", "source", "lang")
    s1.write.mode("append").parquet(inDir)
    val q1 = StreamingCuration.start(spark, inDir, ix, corpusPath, outDir,
      ck, bench, "snippet")
    try q1.processAllAvailable() finally q1.stop()

    val d0 = spark.read.parquet(s"$outDir/batch=000000/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d0(930001L) == "keep", d0.toString)
    // the accepted keeper's corpus text is the SCRUBBED form: the
    // boilerplate words are gone, the novel content survives
    val kept = StreamingCuration.openCorpus(spark, corpusPath)
      .filter(col("doc_id") === 930001L).select("text").as[String].head()
    // the rebuild PRESERVES original case/punctuation on surviving
    // content; the novel content survives, every boiler word (none
    // shared with `unique`) is gone
    assert(kept.contains("astronomers") && kept.contains("observatory"), kept)
    val uniqWords = unique.toLowerCase.split("[^a-z0-9]+")
      .filter(_.nonEmpty).toSet
    val bw = boiler.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .filterNot(uniqWords).head
    assert(!kept.split(" ").contains(bw), s"boiler word '$bw' survived: $kept")
    assert(kept.split(" ").length < (boiler + " " + unique).split(" ").length,
      "scrub removed nothing")

    // batch 1: a clone of A's ORIGINAL raw text scrubs against epochs
    // 0 AND 1 (the accept extended the gram index) — it empties out and
    // falls to the quality gate, the documented degenerate case; fresh
    // content keeps
    val s2 = Seq(
      (940001L, boiler + " " + unique, "web", "en"),
      (940002L, freshB1, "web", "en")
    ).toDF("doc_id", "text", "source", "lang")
    s2.write.mode("append").parquet(inDir)
    val q2 = StreamingCuration.start(spark, inDir, ix, corpusPath, outDir,
      ck, bench, "snippet")
    try q2.processAllAvailable() finally q2.stop()
    val d1 = spark.read.parquet(s"$outDir/batch=000001/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // fully duplicated content scrubs to EMPTY text — it drops at the
    // first gate that sees an empty doc (the LM scores it 0, below every
    // cut), never reaches keep
    assert(Set("gibberish", "low_quality")(d1(940001L)), d1.toString)
    assert(d1(940002L) == "keep", d1.toString)

    // replay batch 1: the scrub must exclude the batch's own gram epoch
    // (else 940002 would find its own accepted grams and self-scrub) and
    // reproduce identical decisions; the gram append is a ledger no-op
    spark.catalog.refreshTable(gtable)
    val gramRows = spark.table(gtable).count()
    StreamingCuration.curateBatch(s2.toDF(), 1L, ix, corpusPath, outDir,
      bench, "snippet")
    val d1r = spark.read.parquet(s"$outDir/batch=000001/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d1r == d1, "replayed decisions differ under the gram scrub")
    spark.catalog.refreshTable(gtable)
    assert(spark.table(gtable).count() == gramRows,
      "replay double-appended gram rows")
    (Seq(table, s"${table}_counts", s"${table}_params") ++
      Seq(gtable, s"${gtable}_params", s"${gtable}_epochs"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("retrain at a quiescence point: committed outputs stay byte-identical, the next batch reads the refit model") {
    val table = "mh_scur_retrain"
    Seq(table, s"${table}_counts", s"${table}_params")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val ix = Curation.Indexes(minhashTable = table,
      statsPath = tmp("rstats"), modelPath = tmp("rmodel"), lmPath = tmp("rlm"))
    val corpusPath = tmp("rcorpus")
    val inDir = tmp("rin"); val outDir = tmp("rout"); val ck = tmp("rck")

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"), col("lang"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    StreamingCuration.bootstrap(corpus, ix, corpusPath)
    val bench = Seq("unrelated benchmark snippet never matching anything")
      .toDF("snippet")
    val keepA = "Completely separate vocabulary appears within this " +
      "lengthy paragraph. Rivers meander through quiet valleys while amber " +
      "sunsets describe patient horizons. Gentle travelers navigate winding " +
      "pathways beneath ancient cedar branches, collecting memorable stories " +
      "during tranquil evenings beside glowing lanterns."
    val keepB = "Another fully independent passage concerning harbors: " +
      "lighthouses signal distant vessels while fishermen repair woven nets " +
      "along weathered docks. Seasonal markets gather merchants, musicians, " +
      "bakers offering warm loaves, plus carpenters displaying oak furniture " +
      "crafted throughout winter months."
    val junkText = ("xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq " +
      "zqxk jqvz ") * 4

    // batch 0: one keep + one LM-rejected consonant salad -> the batch's
    // drift row fires for 'en' (below_frac 0.5 > 0.1)
    val s1 = Seq(
      (950001L, keepA, "web", "en"),
      (950002L, junkText, "web", "en")
    ).toDF("doc_id", "text", "source", "lang")
    s1.write.mode("append").parquet(inDir)
    val q1 = StreamingCuration.start(spark, inDir, ix, corpusPath, outDir,
      ck, bench, "snippet")
    try q1.processAllAvailable() finally q1.stop()
    // QUIESCENT: the stream is stopped and batch 0's offsets committed
    val drift0 = spark.read.parquet(s"$outDir/batch=000000/drift")
      .filter(col("lang") === "en").head()
    assert(drift0.getAs[Boolean]("retrain"), drift0.toString)
    val d0 = spark.read.parquet(s"$outDir/batch=000000/decisions")
      .collect().map(_.toString).sorted.toSeq
    assert(graft.io.Models.current(ix.lmPath) == 0L)

    // the out-of-band retrain the drift row calls for, under the object
    // doc's quiescence contract: refit on the grown corpus, republish
    val grown = StreamingCuration.openCorpus(spark, corpusPath).drop("epoch")
    val report = Curation.retrainIfDrifted(spark, s1.toDF(), grown, ix)
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(report("lm") == (true, 1L), report.toString)
    assert(graft.io.Models.current(ix.lmPath) == 1L)
    // the committed batch's artifacts are untouched by the republish
    val d0r = spark.read.parquet(s"$outDir/batch=000000/decisions")
      .collect().map(_.toString).sorted.toSeq
    assert(d0r == d0, "retrain touched a committed batch's decisions")

    // batch 1 through a restart: the loop's drift row now equals a hand
    // computation against the REFIT model — openModel dereferences the
    // pointer at batch time, so the stream reads v1 without any plumbing
    val s2 = Seq(
      (960001L, keepB, "web", "en"),
      (960002L, junkText.replace("xqzj", "qzxj"), "web", "en")
    ).toDF("doc_id", "text", "source", "lang")
    s2.write.mode("append").parquet(inDir)
    val q2 = StreamingCuration.start(spark, inDir, ix, corpusPath, outDir,
      ck, bench, "snippet")
    try q2.processAllAvailable() finally q2.stop()
    val streamDrift = spark.read.parquet(s"$outDir/batch=000001/drift")
      .collect().map(_.toString).sorted.toSeq
    val handDrift = graft.ops.Lm.driftStats(s2.toDF(),
        graft.ops.Lm.openModel(spark, ix.lmPath))
      .collect().map(_.toString).sorted.toSeq
    assert(streamDrift == handDrift,
      s"batch 1 did not score under the refit model:\n$streamDrift\n$handDrift")
    // same parity for the probe's drift row (its model may or may not
    // have refit — whichever version CURRENT names, stream and hand
    // computation must read the same one)
    val streamPDrift = spark.read
      .parquet(s"$outDir/batch=000001/probe_drift").head()
    val handPDrift = graft.ops.Probe.driftStats(s2.toDF(),
      graft.ops.Probe.openModel(spark, ix.modelPath)).head()
    assert(streamPDrift.toString == handPDrift.toString,
      s"stream probe drift != hand computation:\n$streamPDrift\n$handPDrift")
    // and ingestion itself never moved the pointer
    assert(graft.io.Models.current(ix.lmPath) == 1L)
    Seq(table, s"${table}_counts", s"${table}_params")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
