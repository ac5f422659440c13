package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.Doc

/** The S3/S4 ledger as a STREAMING sink: a file-source stream of document
  * parquet -> the same narrow extraction -> per-batch idempotent snapshot
  * writes. This is the incremental-ingest shape of `Pipeline.run` for an
  * unbounded corpus: new files land in `inDir`, the checkpoint makes the
  * source offsets replayable, and `writeBatch` makes the sink idempotent —
  * together, end-to-end exactly-once (the standard foreachBatch recipe).
  *
  * Each micro-batch becomes snapshot `stream-<batchId>` in the SAME
  * contracts/lineage/manifest layout batch runs use, so `Snapshots.list`,
  * `asOf`, and `resume` work unchanged over streaming output, and a
  * replayed batch (failure between sink write and offset commit) simply
  * overwrites its own partition instead of appending duplicate rows. */
object StreamingPipeline {

  import Pipeline.ExtractedDoc

  private def snapId(batchId: Long): String = f"stream-$batchId%06d"

  /** Idempotent per-batch sink: contracts + lineage into the batch's own
    * snapshot partition (dynamic overwrite), so replaying a batch replaces
    * its partition byte-for-byte. The manifest seq follows the same rule
    * as batch runs — an existing id keeps its slot (replay idempotency), a
    * new one takes max(existing)+1 — NOT the raw batchId, which would
    * collide with batch-mode seqs when a stream writes into an outDir that
    * already holds `Pipeline.run` snapshots and corrupt asOf ordering. */
  def writeBatch(batch: Dataset[ExtractedDoc], batchId: Long, outDir: String): Unit = {
    val id = snapId(batchId)
    Pipeline.assertSnapshotLayout(outDir)
    val prior = graft.io.Snapshots.list(outDir)
    val seq = prior.find(_.snapshotId == id).map(_.seq)
      .getOrElse(prior.map(_.seq).maxOption.map(_ + 1).getOrElse(0L))
    // atomic exclusive-create claim BEFORE any table write — two racing
    // writers cannot both pass (the post-write assertUniqueSeq is only a
    // consistency backstop)
    Pipeline.claimSeq(outDir, id, seq)
    val persisted = batch.persist()
    try {
      persisted.toDF().withColumn("snapshot_id", lit(id))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("snapshot_id").parquet(s"$outDir/contracts")
      Pipeline.lineage(persisted, id)
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("snapshot_id").parquet(s"$outDir/lineage")
      val r = persisted.toDF().agg(
        coalesce(sum(when(col("status") === "ok", 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("status") =!= "ok", 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("status") === "ok", col("n_spans").cast("long"))), lit(0L)))
        .head()
      val manifest =
        s"""{"snapshot_id":"$id","docs_ok":${r.getLong(0)},"docs_err":${r.getLong(1)},"spans_seen":${r.getLong(2)},"seq":$seq}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/_manifest_$id.json"), manifest)
      // single-writer-per-outDir contract: detect a concurrent batch
      // writer claiming the same seq (read-then-write has no lock) and
      // fail loudly instead of corrupting asOf ordering
      Pipeline.assertUniqueSeq(outDir, id, seq)
    } finally persisted.unpersist(blocking = false)
  }

  /** Start the streaming extraction over a parquet file source. Restarting
    * with the same `checkpointDir` resumes from the committed offsets —
    * already-processed files are never re-extracted. */
  def start(spark: SparkSession, inDir: String, outDir: String,
            checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(Encoders.product[Doc].schema)
      .parquet(inDir)
      .as[Doc]
    Pipeline.extract(docs)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[ExtractedDoc], id: Long) => writeBatch(b, id, outDir))
      .start()
  }
}
