package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.gen.Corpus
import graft.pipeline.Pipeline
import graft.model.Doc

/** Distributed-semantics tests over the synthesized corpus: partitioning
  * invariance, salted-vs-direct equality, resume, lineage — the properties
  * the reference gets for free single-threaded and we must prove under
  * shuffles (SURVEY §5 "our mirror"). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  lazy val docs = Corpus.corpus(spark, sf).cache()

  test("corpus is deterministic and bit-reproducible") {
    import spark.implicits._
    val a = docs.collect().sortBy(_.doc_id)
    val b = Corpus.corpus(spark, sf).repartition(7).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.toSeq == b.toSeq)
    // skew tail present
    val sizes = a.map(_.spans.size)
    assert(sizes.max > 10 * sizes.min)
  }

  test("direct extraction: 500/500 ok, no errors, plausible fields") {
    import spark.implicits._
    val m = Pipeline.newMetrics(spark)
    val out = Pipeline.extract(docs, Some(m)).cache()
    assert(out.count() == 500)
    assert(out.filter($"status" === "error").count() == 0)
    assert(m.docsOk.value == 500 && m.docsErr.value == 0)
    val rows = out.select("contract.*").cache()
    // every doc has a title (synthesizer always renders a heading)
    assert(rows.filter($"title".isNull).count() == 0)
    // contract types follow the synthesized phrases
    val types = rows.groupBy("contract_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.keySet.subsetOf(Set("MSA", "LSA", "SOW", "PWO", "CR", "CNF")))
    // most docs carry 2 dates -> effective < expiration (validation rule)
    val dated = rows.filter($"effective_date".isNotNull && $"expiration_date".isNotNull)
    assert(dated.filter($"effective_date" >= $"expiration_date").count() == 0)
  }

  test("extraction is invariant under repartitioning (span-order north rule)") {
    import spark.implicits._
    val a = Pipeline.extract(docs).select("contract.*")
      .collect().map(_.toString).sorted
    val b = Pipeline.extract(docs.repartition(13)).select("contract.*")
      .collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("salted mega-doc path == direct path, exactly") {
    import spark.implicits._
    val direct = Pipeline.extract(docs).select("contract.*")
      .collect().map(_.toString).sorted
    val salted = Pipeline.extractSalted(docs, chunkSize = 64).select("contract.*")
      .collect().map(_.toString).sorted
    assert(direct.toSeq == salted.toSeq)
  }

  test("salted path feeds the same accumulator totals as the direct path") {
    import spark.implicits._
    val md = Pipeline.newMetrics(spark)
    Pipeline.extract(docs, Some(md)).count()
    val ms = Pipeline.newMetrics(spark)
    // the *With form also owns + releases the intermediate cache
    val n = Pipeline.extractSaltedWith(docs, chunkSize = 64, Some(ms))(_.count())
    assert(n == 500)
    assert(ms.docsOk.value == md.docsOk.value, s"ok ${ms.docsOk.value} vs ${md.docsOk.value}")
    assert(ms.docsErr.value == md.docsErr.value)
    assert(ms.spansSeen.value == md.spansSeen.value,
      s"spans ${ms.spansSeen.value} vs ${md.spansSeen.value}")
  }

  test("run + lineage + resume: ledger anti-join skips done docs") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-run").toString
    val (ok, err) = Pipeline.run(spark, docs, out, "snap-001")
    assert(ok == 500 && err == 0)
    val ledger = spark.read.parquet(s"$out/lineage")
    assert(ledger.count() == 500)
    assert(ledger.select("partition_id").distinct().count() >= 1)
    // resume: nothing left
    assert(Pipeline.resume(docs, ledger).count() == 0)
    // resume with a truncated ledger: exactly the missing docs remain
    val partial = ledger.filter(xxhash64(col("doc_id")) % 5 =!= 0)
    val remaining = Pipeline.resume(docs, partial)
    assert(remaining.count() == 500 - partial.count())
    // manifest written, with both metric channels: accumulator counts and
    // the listener-bus execution snapshot (records actually processed)
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_manifest_snap-001.json"))
    assert(manifest.contains("\"docs_ok\":500"), manifest)
    assert(manifest.contains("\"execution\":{"), manifest)
    val recordsRead = "\"records_read\":(\\d+)".r
      .findFirstMatchIn(manifest).map(_.group(1).toLong)
    assert(recordsRead.exists(_ >= 500), manifest)
    assert(manifest.contains("\"failed_tasks\":0"), manifest)
  }

  test("snapshot as-of: resume against snapshot A reprocesses exactly B's docs") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-asof").toString
    // snapshot A: a deterministic ~4/5 subset; snapshot B: everything
    // (so A-docs are REPROCESSED in B — exercises keep-latest resolution)
    val docsA = docs.filter(xxhash64(col("doc_id")) % 5 =!= 0)
    val idsA = docsA.select("doc_id").collect().map(_.getString(0)).toSet
    Pipeline.run(spark, docsA, out, "snap-a")
    Pipeline.run(spark, docs, out, "snap-b")
    assert(graft.io.Snapshots.list(out).map(m => (m.snapshotId, m.seq)) ==
      Seq(("snap-a", 0L), ("snap-b", 1L)))
    // as of B: complete — nothing left to resume, 500 distinct contracts,
    // every one resolved to its snap-b (latest) row
    val atB = graft.io.Snapshots.asOf(spark, out, "snap-b")
    assert(Pipeline.resume(docs, atB.ledger).count() == 0)
    assert(atB.contracts.count() == 500)
    assert(atB.contracts.select("contract.doc_id").distinct().count() == 500)
    assert(atB.contracts.filter(col("snapshot_id") =!= "snap-b").count() == 0)
    // as of A: exactly the docs B added are pending again
    val redo = graft.io.Snapshots.resumeAsOf(docs, out, "snap-a")
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(redo == docs.select("doc_id").collect().map(_.getString(0)).toSet -- idsA)
    assert(redo.nonEmpty)
    // and A's contract state contains exactly A's docs
    val atA = graft.io.Snapshots.asOf(spark, out, "snap-a")
    assert(atA.contracts.count() == idsA.size)
  }

  test("snapshot compaction: expire+rewrite preserves asOf/resume at and after the point") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // three snapshots with reprocessing overlap; C does NOT cover all, so
    // a nonempty pending set must survive compaction unchanged
    Pipeline.run(spark, docs.filter(xxhash64(col("doc_id")) % 5 =!= 0), out, "snap-a")
    Pipeline.run(spark, docs.filter(xxhash64(col("doc_id")) % 3 === 0), out, "snap-b")
    Pipeline.run(spark, docs.filter(xxhash64(col("doc_id")) % 7 === 0), out, "snap-c")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("contract.doc_id"), col("status"), col("op_hash"), col("n_spans"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val atC0 = key(graft.io.Snapshots.asOf(spark, out, "snap-c").contracts)
    val atB0 = key(graft.io.Snapshots.asOf(spark, out, "snap-b").contracts)
    val pend0 = graft.io.Snapshots.pending(spark, docs, out)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(pend0.nonEmpty)

    val id = graft.io.Snapshots.compact(spark, out, "snap-b")
    assert(id == "compact-snap-b")
    // history before the point is expired; the baseline takes its seq
    assert(graft.io.Snapshots.list(out).map(m => (m.snapshotId, m.seq)) ==
      Seq(("compact-snap-b", 1L), ("snap-c", 2L)))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_seq_1")).trim == "compact-snap-b")
    // reads at and after the point are value-identical
    assert(key(graft.io.Snapshots.asOf(spark, out, "snap-c").contracts) == atC0)
    assert(key(graft.io.Snapshots.asOf(spark, out, "compact-snap-b").contracts) == atB0)
    val pend1 = graft.io.Snapshots.pending(spark, docs, out)
      .select("doc_id").collect().map(_.getString(0)).toSet
    assert(pend1 == pend0, "pending set changed across compaction")
    // folded partitions and manifests are gone; the baseline is compact
    for (t <- Seq("contracts", "lineage"); s <- Seq("snap-a", "snap-b")) {
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, t, s"snapshot_id=$s")), s"$t/$s survived")
    }
    val baseFiles = java.nio.file.Files.list(
        java.nio.file.Paths.get(out, "contracts", "snapshot_id=compact-snap-b"))
      .iterator()
    val n = Iterator.continually(baseFiles).takeWhile(_.hasNext).map(_.next())
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(n == 1, s"baseline not compacted to one file: $n")
    // the swap protocol file must not linger
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_compact_pending")))
  }

  test("snapshot compaction: a crash after the protocol file publishes is recovered by retry") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact-crash").toString
    Pipeline.run(spark, docs.filter(xxhash64(col("doc_id")) % 5 =!= 0), out, "snap-a")
    Pipeline.run(spark, docs.filter(xxhash64(col("doc_id")) % 3 === 0), out, "snap-b")
    Pipeline.run(spark, docs.filter(xxhash64(col("doc_id")) % 7 === 0), out, "snap-c")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("contract.doc_id"), col("status"), col("op_hash"), col("n_spans"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val atC0 = key(graft.io.Snapshots.asOf(spark, out, "snap-c").contracts)
    val atB0 = key(graft.io.Snapshots.asOf(spark, out, "snap-b").contracts)

    // crash at the worst point: baseline written, protocol file published,
    // swap not yet run
    intercept[IllegalStateException] {
      graft.io.Snapshots.compactImpl(spark, out, "snap-b", 1, crashBeforeSwap = true)
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_compact_pending")))
    // pre-swap state: old manifests intact, so readers still see the old
    // history untouched (the baseline partitions are manifestless)
    assert(graft.io.Snapshots.list(out).map(_.snapshotId) ==
      Seq("snap-a", "snap-b", "snap-c"))
    assert(key(graft.io.Snapshots.asOf(spark, out, "snap-c").contracts) == atC0)

    // retry with the same args completes the swap and returns the id
    val id = graft.io.Snapshots.compact(spark, out, "snap-b")
    assert(id == "compact-snap-b")
    assert(graft.io.Snapshots.list(out).map(m => (m.snapshotId, m.seq)) ==
      Seq(("compact-snap-b", 1L), ("snap-c", 2L)))
    assert(key(graft.io.Snapshots.asOf(spark, out, "snap-c").contracts) == atC0)
    assert(key(graft.io.Snapshots.asOf(spark, out, "compact-snap-b").contracts) == atB0)
    for (t <- Seq("contracts", "lineage"); s <- Seq("snap-a", "snap-b")) {
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, t, s"snapshot_id=$s")), s"$t/$s survived")
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_compact_pending")))
    // a second retry is a no-op that still answers with the baseline id
    assert(graft.io.Snapshots.compact(spark, out, "snap-b") == "compact-snap-b")
  }

  test("changes-feed index refresh: the snapshot delta folds into the minhash index as one epoch") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-refresh").toString
    val clone = "quixotic zephyr brambles of verdigris atop the waning citadel walls"
    // source of truth for raw text: id space equals the snapshot's doc ids
    val source = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("doc-"), col("doc_id")).as("doc_id"), col("text"))
      .union(Seq(("doc-999001", clone)).toDF("doc_id", "text"))
    val inA = xxhash64(col("doc_id")) % 3 =!= 0
    val a = docs.filter(inA)
    // snapshot B: the remaining docs (NEW), a reprocessed slice of A, and
    // a planted clone doc whose only near-dup arrives later as a probe
    val b = docs.filter(!inA)
      .union(docs.filter(inA && xxhash64(col("doc_id")) % 5 === 0))
      .union(Seq(Corpus.synth(999001L, clone)).toDS())
    Pipeline.run(spark, a, out, "snap-a")
    Pipeline.run(spark, b, out, "snap-b")
    // base index = snapshot A's doc set
    val table = "graft_refresh_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Seq(table, s"${table}_counts", s"${table}_params").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.ops.Dedup.writeMinhashIndex(
      source.join(a.select(col("doc_id").as("_aid")),
        col("doc_id") === col("_aid"), "left_semi"),
      "doc_id", "text", table)
    val r = graft.pipeline.IndexRefresh.minhashFromChanges(
      spark, out, "snap-a", "snap-b", source, "doc_id", "text", table)
    assert(!r.alreadyRefreshed)
    assert(r.epoch == 1L, s"epoch should be snap-b's seq: ${r.epoch}")
    val nNew = docs.filter(!inA).count() + 1 // + the planted clone doc
    val nRep = docs.filter(inA && xxhash64(col("doc_id")) % 5 === 0).count()
    assert(r.appended == nNew, s"appended=${r.appended} want=$nNew")
    assert(r.skippedExisting == nRep, s"skipped=${r.skippedExisting} want=$nRep")
    // the refreshed index finds a probe's near-dup among the DELTA docs
    val probe = Seq(("doc-999002", clone)).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.incrementalCandidates(probe, "doc_id", "text",
        graft.ops.Dedup.openMinhashIndex(spark, table))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("doc-999001", "doc-999002")),
      s"clone pair missing from refreshed index: $pairs")
    // replay: exactly-once per snapshot — nothing touched
    val nRows = spark.table(table).count()
    val r2 = graft.pipeline.IndexRefresh.minhashFromChanges(
      spark, out, "snap-a", "snap-b", source, "doc_id", "text", table)
    assert(r2.alreadyRefreshed && r2.appended == 0L)
    assert(spark.table(table).count() == nRows)
    Seq(table, s"${table}_counts", s"${table}_params").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("pending: a doc whose LATEST snapshot errored is reprocessed despite an older ok record") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-stale").toString
    val subset = docs.orderBy("doc_id").limit(20).as[Doc]
    val (okA, errA) = Pipeline.run(spark, subset, out, "snap-a")
    assert(okA == 20 && errA == 0)
    // same ids, broken payload: every doc soft-fails in snap-b
    val broken = subset.map(d => Doc(d.doc_id, null))
    val (okB, errB) = Pipeline.run(spark, broken, out, "snap-b")
    assert(okB == 0 && errB == 20)
    // the raw union ledger still holds snap-a's ok rows; the resume
    // decision must come from each doc's LATEST record (all errored)
    assert(graft.io.Snapshots.pending(spark, subset, out).count() == 20)
    // time travel: as of snap-a everything was ok, nothing pending
    assert(graft.io.Snapshots.resumeAsOf(subset, out, "snap-a").count() == 0)
  }

  test("incremental read: changes(from, to) is exactly the delta that became authoritative") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-changes").toString
    val ordered = docs.orderBy("doc_id").limit(20).as[Doc]
    val a = ordered.limit(15)                      // snap-a: docs 1..15
    val b = ordered.orderBy(desc("doc_id")).limit(10).as[Doc] // snap-b: 11..20 (5 reprocessed, 5 new)
    Pipeline.run(spark, a, out, "snap-a")
    Pipeline.run(spark, b, out, "snap-b")
    val bIds = b.select("doc_id").collect().map(_.getString(0)).toSet
    val delta = graft.io.Snapshots.changes(spark, out, "snap-a", "snap-b")
    assert(delta.select("contract.doc_id").collect().map(_.getString(0)).toSet == bIds)
    assert(delta.filter(col("snapshot_id") =!= "snap-b").count() == 0)
    // self-delta is empty; inverted range fails loudly
    assert(graft.io.Snapshots.changes(spark, out, "snap-b", "snap-b").count() == 0)
    intercept[IllegalArgumentException] {
      graft.io.Snapshots.changes(spark, out, "snap-b", "snap-a")
    }
  }

  test("legacy seq-less manifests keep stable slots; new snapshots take the next seq") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-legacy").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    // a manifest written before the seq field existed
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/_manifest_old.json"),
      """{"snapshot_id":"old","docs_ok":7,"docs_err":0,"spans_seen":9}""")
    // "alpha" sorts BEFORE "old" by filename: positional indexing over the
    // combined listing would hand the legacy manifest seq 1 == alpha's and
    // corrupt latest()/asOf() ordering
    Pipeline.run(spark, docs.orderBy("doc_id").limit(5).as[Doc], out, "alpha")
    val ms = graft.io.Snapshots.list(out)
    assert(ms.map(m => (m.snapshotId, m.seq)) == Seq(("old", 0L), ("alpha", 1L)), ms.toString)
    assert(graft.io.Snapshots.latest(out).map(_.snapshotId).contains("alpha"))
  }

  test("run refuses a pre-snapshot flat parquet layout instead of half-writing into it") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-flat").toString
    // a flat, unpartitioned contracts table from the old writer
    spark.range(3).toDF().write.parquet(s"$out/contracts")
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, docs.limit(1).as[Doc], out, "snap-x")
    }
    assert(e.getMessage.contains("flat parquet"), e.getMessage)
  }

  test("lineage carries the caller-supplied batchTs (deterministic replay)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-ts").toString
    val subset = docs.orderBy("doc_id").limit(5).as[Doc]
    Pipeline.run(spark, subset, out, "snap-ts", batchTs = 1723872000123L)
    val ts = spark.read.parquet(s"$out/lineage")
      .select("ts").distinct().collect().map(_.getLong(0)).toSeq
    assert(ts == Seq(1723872000123L), ts.toString)
    // same batchTs on replay -> byte-identical ledger semantics
    Pipeline.run(spark, subset, out, "snap-ts", batchTs = 1723872000123L)
    val ts2 = spark.read.parquet(s"$out/lineage")
      .select("ts").distinct().collect().map(_.getLong(0)).toSeq
    assert(ts2 == Seq(1723872000123L))
    // the manifest records it too
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_manifest_snap-ts.json"))
    assert(manifest.contains("\"batch_ts\":1723872000123"), manifest)
  }

  test("concurrent-writer seq collision is detected loudly, not silently corrupted") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-collide").toString
    val subset = docs.orderBy("doc_id").limit(3).as[Doc]
    Pipeline.run(spark, subset, out, "snap-a") // takes seq 0
    // a concurrent writer (no lock exists — single-writer contract) claimed
    // the same seq under a different id between our read and write
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/_manifest_thief.json"),
      """{"snapshot_id":"thief","docs_ok":1,"docs_err":0,"spans_seen":1,"seq":0}""")
    // replaying snap-a keeps its seq slot 0 -> now duplicated; the write
    // must fail loudly instead of leaving asOf ordering corrupted
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, subset, out, "snap-a")
    }
    assert(e.getMessage.contains("seq collision"), e.getMessage)
  }

  test("seq slot is CLAIMED atomically before any write, not just detected after") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-claim").toString
    val subset = docs.orderBy("doc_id").limit(3).as[Doc]
    // another in-flight writer holds the exclusive-create marker for seq 0
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/_seq_0"), "other-writer")
    val e = intercept[IllegalArgumentException] {
      Pipeline.run(spark, subset, out, "snap-b")
    }
    assert(e.getMessage.contains("already claimed"), e.getMessage)
    // the claim fired BEFORE the table write: nothing landed on disk
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/contracts")))
    // the marker's own writer re-claims its slot freely (idempotent replay)
    Pipeline.run(spark, subset, out, "other-writer")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/_manifest_other-writer.json")))
  }

  test("demo outDir guard: refuses foreign trees, cleans owned or empty dirs") {
    import java.nio.file.{Files, Paths}
    // foreign non-empty dir -> loud refusal, nothing deleted
    val foreign = Files.createTempDirectory("graft-guard-foreign")
    Files.writeString(foreign.resolve("precious.txt"), "do not delete")
    val e = intercept[IllegalArgumentException] {
      Demo.cleanOwnedOutDir(foreign.toString)
    }
    assert(e.getMessage.contains("refusing to delete"))
    assert(Files.exists(foreign.resolve("precious.txt")))
    // demo-owned dir (manifest marker) -> wiped, including other content
    val owned = Files.createTempDirectory("graft-guard-owned")
    Files.writeString(owned.resolve("_manifest_demo.json"), "{}")
    Files.createDirectories(owned.resolve("contracts"))
    Files.writeString(owned.resolve("contracts").resolve("part-0.parquet"), "x")
    Demo.cleanOwnedOutDir(owned.toString)
    assert(!Files.exists(owned))
    // empty dir -> wiped; absent dir -> no-op
    val empty = Files.createTempDirectory("graft-guard-empty")
    Demo.cleanOwnedOutDir(empty.toString)
    assert(!Files.exists(empty))
    Demo.cleanOwnedOutDir(Paths.get(empty.toString, "never-existed").toString)
  }

  test("retry queue filter (S1)") {
    import spark.implicits._
    val state = Seq(
      ("d1", "failed", 1, 100L), ("d2", "failed", 3, 100L),
      ("d3", "failed", 1, 900L), ("d4", "ok", 0, 0L))
      .toDF("doc_id", "status", "attempts", "retry_after")
    val ready = Pipeline.retryReady(state, batchTs = 500L)
    assert(ready.select("doc_id").collect().map(_.getString(0)).toSeq == Seq("d1"))
  }

  test("soft-fail: a poisoned doc becomes an error row, not a job failure") {
    import spark.implicits._
    val poisoned: org.apache.spark.sql.Dataset[Doc] =
      Seq(Doc("bad-1", null), Doc("ok-1", Seq(graft.model.Span("heading", "T", "", 0)))).toDS()
    val m = Pipeline.newMetrics(spark)
    val out = Pipeline.extract(poisoned, Some(m)).collect()
    assert(out.length == 2)
    assert(out.count(_.status == "error") == 1)
    assert(m.docsErr.value == 1)
  }
}
