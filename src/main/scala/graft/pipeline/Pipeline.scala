package graft.pipeline

import scala.jdk.CollectionConverters._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import graft.extract.{Extract, Rules}
import graft.model.{ContractRow, Doc, LineageRec, Span}

/** End-to-end extraction pipeline (SURVEY §3.3 re-expressed Spark-first).
  *
  * Scale design:
  *  - The direct path is a NARROW plan: parquet scan -> per-partition map.
  *    Zero shuffles; scales linearly with executors. Parquet column
  *    pruning applies (only doc_id + spans are read).
  *  - Per-document failures become `status='error'` rows instead of
  *    killing the job (reference soft-fail: services/pdf_converter.py:
  *    279-285, safe_table_processor.py:24-30) — at 10^12 docs one corrupt
  *    row must never fail a stage.
  *  - Mega documents (skew tail) go through `extractSalted`: spans are
  *    exploded into bounded chunks, salted across the cluster, partially
  *    extracted, then merged order-aware (Extract.mergeEvidence). AQE
  *    only fixes join/agg skew, not per-row compute skew, so this stays
  *    explicit (SURVEY §4).
  *  - Metrics via LongAccumulators (north rule), lineage as a projection
  *    of the written output — one pass, no recompute.
  */
object Pipeline {

  case class ExtractedDoc(
      contract: ContractRow,
      status: String,
      error: String,
      partition_id: Int,
      n_spans: Int,
      op_hash: String)

  case class Metrics(docsOk: LongAccumulator, docsErr: LongAccumulator,
                     spansSeen: LongAccumulator)

  def newMetrics(spark: SparkSession): Metrics = Metrics(
    spark.sparkContext.longAccumulator("graft.docs_ok"),
    spark.sparkContext.longAccumulator("graft.docs_err"),
    spark.sparkContext.longAccumulator("graft.spans_seen"))

  /** Per-doc extraction with the soft-fail envelope (shared by the direct
    * and salted paths so their small-doc semantics are identical). */
  private def extractOne(doc: Doc, pid: Int, metrics: Option[Metrics]): ExtractedDoc =
    try {
      val row = Extract.extractDoc(doc)
      metrics.foreach { m => m.docsOk.add(1); m.spansSeen.add(doc.spans.size) }
      ExtractedDoc(row, "ok", "", pid, doc.spans.size,
        Rules.opHash(doc.doc_id, "extract", doc.doc_id, row.contract_number))
    } catch {
      case e: Exception =>
        metrics.foreach(_.docsErr.add(1))
        val nSpans = if (doc.spans == null) 0 else doc.spans.size
        ExtractedDoc(emptyRow(doc.doc_id), "error",
          String.valueOf(e.getMessage), pid, nSpans,
          Rules.opHash(doc.doc_id, "error", doc.doc_id, ""))
    }

  /** Direct path: one narrow mapPartitions, soft-fail per doc. */
  def extract(docs: Dataset[Doc], metrics: Option[Metrics] = None): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      it.map(doc => extractOne(doc, pid, metrics))
    }
  }

  private def emptyRow(docId: String): ContractRow =
    ContractRow(docId, null, "N/A", "USD", None, null, null, "N/A", "N/A",
      "MSA", Seq.empty, Seq.empty, 0, Seq.empty, 0, 0.0)

  /** Salted skew path. Docs with more than `chunkSize*2` spans are split
    * into `chunkSize`-span chunks, redistributed by (doc_id, chunk_idx)
    * hash — so one mega doc fans out across the cluster — partially
    * extracted, and merged back order-aware. Small docs take the direct
    * path; the union preserves exact per-doc semantics (property-tested
    * against the direct path). */
  def extractSalted(docs: Dataset[Doc], chunkSize: Int = 256,
                    metrics: Option[Metrics] = None): Dataset[ExtractedDoc] =
    saltedInternal(docs, chunkSize, metrics)._1

  /** Salted path that OWNS the intermediate cache: runs `use` against the
    * extracted dataset, then unpersists the tagged intermediate eagerly.
    * Long-lived drivers calling the salted path repeatedly should use this
    * form — plain `extractSalted` leaves the cache to the ContextCleaner,
    * which only reclaims it when the dataset reference is GC'd. */
  def extractSaltedWith[T](docs: Dataset[Doc], chunkSize: Int = 256,
                           metrics: Option[Metrics] = None)
                          (use: Dataset[ExtractedDoc] => T): T = {
    val (out, tagged) = saltedInternal(docs, chunkSize, metrics)
    try use(out) finally tagged.unpersist(blocking = false)
  }

  private def saltedInternal(docs: Dataset[Doc], chunkSize: Int,
                             metrics: Option[Metrics])
      : (Dataset[ExtractedDoc], Dataset[_]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE narrow upstream pass: small docs are fully extracted inline
    // (exactly the direct path's per-doc work) and mega docs emit span
    // chunks. The small/big branches are two consumers of this dataset and
    // Spark does not share subplans across union branches, so it IS
    // persisted — but because extraction already happened, the cache holds
    // only finished rows + the ~1% skew-tail chunks, not the corpus
    // (caching the raw corpus cost 15-27x the direct path in r1/r2 probes).
    // The ContextCleaner unpersists it when the dataset is GC'd; at
    // cluster scale this intermediate would be a checkpointed table.
    val tagged = docs.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      it.flatMap { d =>
        val n = if (d.spans == null) 0 else d.spans.size
        if (n <= chunkSize * 2)
          Iterator((Option(extractOne(d, pid, metrics)), Option.empty[(String, Int, Seq[Span])]))
        else
          d.spans.sortBy(_.offset).grouped(chunkSize).zipWithIndex
            .map { case (c, i) => (Option.empty[ExtractedDoc], Option((d.doc_id, i, c))) }
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the cache ONCE before the union consumes it: the two
    // branches otherwise race-compute the same uncached partitions inside
    // one job (per-partition work duplicated, ~2x the narrow pass)
    tagged.foreachPartition((_: Iterator[_]) => ())
    val small: Dataset[ExtractedDoc] = tagged.flatMap(_._1)
    val chunks: Dataset[(String, Int, Seq[Span])] = tagged.flatMap(_._2)
    // salt: hash-partition on (doc_id, chunk_idx) so chunks of one mega
    // doc land on different executors. Per-chunk soft-fail mirrors the
    // direct path: one corrupt mega-doc becomes a status='error' row, it
    // must not fail the stage. The raw chunk size rides along so the
    // merged n_spans equals the direct path's doc.spans.size.
    val evidences = chunks
      .repartition(col("_1"), col("_2"))
      .map { case (id, idx, spans) =>
        try (id, idx, Option(Extract.chunkEvidence(idx, Extract.stripBoilerplate(spans))),
          spans.size, "")
        catch {
          case e: Exception =>
            (id, idx, Option.empty[Extract.ChunkEvidence], spans.size, String.valueOf(e.getMessage))
        }
      }
    val merged: Dataset[ExtractedDoc] = evidences
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val all = it.toSeq
        val nSpans = all.iterator.map(_._4).sum
        try {
          // deterministic error pick: group-iterator order varies with the
          // repartition, so a multi-chunk failure surfaces the error of the
          // MINIMUM chunk index, not whichever chunk arrived first
          all.filter(_._5.nonEmpty).sortBy(_._2).headOption
            .foreach(c => throw new RuntimeException(c._5))
          val row = Extract.mergeEvidence(id, all.flatMap(_._3))
          metrics.foreach { m => m.docsOk.add(1); m.spansSeen.add(nSpans) }
          ExtractedDoc(row, "ok", "", TaskContext.getPartitionId(), nSpans,
            Rules.opHash(id, "extract_salted", id, row.contract_number))
        } catch {
          case e: Exception =>
            metrics.foreach(_.docsErr.add(1))
            ExtractedDoc(emptyRow(id), "error", String.valueOf(e.getMessage),
              TaskContext.getPartitionId(), nSpans,
              Rules.opHash(id, "error", id, ""))
        }
      }
    (small.unionByName(merged), tagged)
  }

  /** Lineage table (SNK7 / north rule) as a PROJECTION of extraction
    * output — per (doc, stage) record with partition id and op hash.
    * `batchTs` is the batch's processing timestamp, SUPPLIED by the caller
    * (the reference's ProcessingOperation records one,
    * system_contract_organizer.py:53-62) — explicit so replays and tests
    * stay deterministic: the same batchTs reproduces the same ledger. */
  def lineage(extracted: Dataset[ExtractedDoc], snapshotId: String,
              batchTs: Long = 0L): Dataset[LineageRec] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.map(e => LineageRec(e.contract.doc_id, e.partition_id,
      "extract", e.status, e.op_hash, snapshotId, batchTs))
  }

  /** Run + persist: contracts parquet, lineage parquet, manifest JSON —
    * the Iceberg-snapshot-shaped checkpoint emulation (SURVEY §7.4.4:
    * no Iceberg jar in the sandbox; the manifest records snapshot id,
    * sequence, and counts so a real Iceberg impl can slot in).
    *
    * Both tables are PARTITIONED BY snapshot_id with dynamic partition
    * overwrite: each snapshot appends its own partition, replaying a
    * snapshot id replaces exactly that partition (idempotent), and history
    * accumulates — which is what makes `Snapshots.asOf` (read the state as
    * of snapshot N) a partition-pruned filter instead of a table rebuild. */
  /** Guard against resuming into a pre-snapshot FLAT layout: dynamic
    * partition overwrite only replaces the partitions it writes, so
    * root-level part-files from the old unpartitioned writer would survive
    * next to the new snapshot_id= directories and the read-back dies on
    * Spark's "conflicting directory structures". Fail fast with the fix
    * instead of half-writing a snapshot. (Driver-side listing; like the
    * manifest I/O this is the sandbox's local-FS stand-in for the catalog.) */
  private[pipeline] def assertSnapshotLayout(outDir: String): Unit =
    for (table <- Seq("contracts", "lineage")) {
      val p = java.nio.file.Paths.get(outDir, table)
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        val flat = try s.iterator().asScala.exists { f =>
          java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet")
        } finally s.close()
        require(!flat,
          s"$p holds flat parquet files from the pre-snapshot layout; " +
            "snapshot writes are partitioned by snapshot_id and cannot mix " +
            "with them — move the old files aside or use a fresh outDir")
      }
    }

  /** Atomically CLAIM a snapshot seq slot before any data is written: the
    * claim is an exclusive-create marker file `_seq_<N>` whose content is
    * the claiming snapshot id. `Files.createFile` is atomic on the local
    * FS (the sandbox's catalog stand-in — a real deployment claims via
    * the table catalog's conditional commit), so two concurrent writers
    * racing for the same seq cannot both pass: exactly one creates the
    * marker, the other fails loudly here before touching the tables.
    * Re-running the SAME snapshot id re-claims its own slot (marker
    * content matches) — the supported idempotent-replay pattern. */
  private[pipeline] def claimSeq(outDir: String, snapshotId: String,
                                 seq: Long): Unit = {
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    val marker = dir.resolve(s"_seq_$seq")
    try {
      java.nio.file.Files.createFile(marker)
      java.nio.file.Files.writeString(marker, snapshotId)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val owner = try java.nio.file.Files.readString(marker).trim
        catch { case _: java.io.IOException => "" }
        require(owner == snapshotId,
          s"snapshot seq $seq in $outDir is already claimed by " +
            s"'${if (owner.isEmpty) "another in-flight writer" else owner}' — " +
            s"cannot claim it for '$snapshotId'; an outDir supports a " +
            "single writer at a time; serialize writers or use separate outDirs")
    }
  }

  /** Post-write consistency check behind [[claimSeq]]: re-list the
    * manifests and fail loudly if a duplicate seq landed anyway (e.g. a
    * manifest forged outside the claim protocol, or markers deleted).
    * Detection-only — the atomic exclusivity lives in the claim. */
  private[pipeline] def assertUniqueSeq(outDir: String, snapshotId: String,
                                        seq: Long): Unit = {
    val dupes = graft.io.Snapshots.list(outDir)
      .filter(s => s.seq == seq && s.snapshotId != snapshotId)
    require(dupes.isEmpty,
      s"snapshot seq collision in $outDir: seq=$seq claimed by both " +
        s"'$snapshotId' and '${dupes.map(_.snapshotId).mkString(", ")}' — " +
        "an outDir supports a single writer at a time; serialize writers " +
        "or use separate outDirs")
  }

  def run(spark: SparkSession, docs: Dataset[Doc], outDir: String,
          snapshotId: String, batchTs: Long = 0L): (Long, Long) = {
    import spark.implicits._
    assertSnapshotLayout(outDir)
    val m = newMetrics(spark)
    // execution-level metrics ride the listener bus (north rule:
    // accumulators AND listeners); snapshot lands in the manifest
    val listener = new graft.metrics.ThroughputListener
    spark.sparkContext.addSparkListener(listener)
    // snapshot ordering: re-running an id keeps its sequence slot,
    // a new id gets the next one
    val prior = graft.io.Snapshots.list(outDir)
    val seq = prior.find(_.snapshotId == snapshotId).map(_.seq)
      .getOrElse(prior.map(_.seq).maxOption.map(_ + 1).getOrElse(0L))
    claimSeq(outDir, snapshotId, seq)
    try {
      val extracted = extract(docs, Some(m))
      extracted.toDF().withColumn("snapshot_id", lit(snapshotId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("snapshot_id").parquet(s"$outDir/contracts")
      // lineage from the WRITTEN output (columnar re-read, no recompute)
      val written = spark.read.parquet(s"$outDir/contracts")
        .filter(col("snapshot_id") === snapshotId).drop("snapshot_id")
        .as[ExtractedDoc]
      lineage(written, snapshotId, batchTs)
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("snapshot_id").parquet(s"$outDir/lineage")
      // manifest counts come from the WRITTEN output, not the
      // accumulators: accumulator updates inside transformations are
      // at-least-once under task retries/speculation and can overcount
      // (the same failure mode DropStats.cappedFilter avoids for drop
      // counts). The accumulators stay for LIVE observability only; the
      // durable record is this exactly-once aggregate over the snapshot
      // partition (status + n_spans — a column-pruned scan).
      val counts = written.toDF().agg(
        coalesce(sum(when(col("status") === "ok", 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("status") === "error", 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("status") === "ok", col("n_spans").cast("long"))
          .otherwise(0L)), lit(0L))).head()
      val (docsOk, docsErr, spansSeen) =
        (counts.getLong(0), counts.getLong(1), counts.getLong(2))
      // drain the listener bus so the snapshot sees every finished task
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext, 10000)
      val manifest =
        s"""{"snapshot_id":"$snapshotId","docs_ok":$docsOk,"docs_err":$docsErr,"spans_seen":$spansSeen,"seq":$seq,"batch_ts":$batchTs,"execution":${listener.snapshotJson}}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/_manifest_$snapshotId.json"), manifest)
      assertUniqueSeq(outDir, snapshotId, seq)
      (docsOk, docsErr)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  /** Resume (S3/S4): anti-join pending docs against the lineage ledger —
    * only docs without an 'ok' extract record are reprocessed. Ledger side
    * is aggregated to doc_id before the join; Catalyst broadcast-joins it
    * when small, shuffle-joins when not. */
  def resume(docs: Dataset[Doc], ledger: DataFrame): Dataset[Doc] = {
    val done = ledger.filter(col("status") === "ok" && col("stage") === "extract")
      .select(col("doc_id")).distinct()
    docs.join(done, docs("doc_id") === done("doc_id"), "left_anti")
      .as[Doc](docs.encoder)
  }

  /** S1 — retry-queue semantics as a batch filter: attempts < maxRetries
    * and retry_after <= now -> retry_ready; terminal skip otherwise
    * (services/file_handler.py:85-114,504-561). */
  def retryReady(state: DataFrame, batchTs: Long, maxRetries: Int = 3): DataFrame =
    state.filter(col("status") === "failed" &&
      col("attempts") < maxRetries && col("retry_after") <= batchTs)
}
