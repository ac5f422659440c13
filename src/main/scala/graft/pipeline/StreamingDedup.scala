package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ops.Dedup

/** Streaming form of incremental corpus-ingestion dedup: document shards
  * land as parquet files; each micro-batch probes the persisted minhash
  * index for candidates (new-vs-corpus + new-vs-new), writes them under
  * the batch's own directory, and folds the batch into the index as its
  * own epoch.
  *
  * Exactly-once without markers:
  *  - the candidates write OVERWRITES the batch's directory (replay
  *    replaces it byte-for-byte);
  *  - the probe excludes the batch's OWN epoch from the index
  *    (`excludeEpoch`), so a replay that crashed after the index append
  *    still recomputes candidates against the pre-append state;
  *  - the index append is a no-op when the epoch is already present
  *    (a Spark write job commits atomically — an epoch is fully present
  *    or absent), so replaying cannot double-append.
  * Batch 0 CREATES the index (full overwrite — idempotent) and its
  * candidates are the within-batch pairs, which is exactly the
  * incremental semantics against an empty index. */
object StreamingDedup {

  /** Minimal shard schema the dedup tier needs. */
  val ShardSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def batchDir(outDir: String, batchId: Long): String =
    f"$outDir/batch=$batchId%06d"

  /** One micro-batch: probe -> write candidates -> fold into the index.
    * Idempotent under replay (see object doc). */
  def dedupBatch(batch: DataFrame, batchId: Long, table: String,
                 outDir: String, maxBucket: Int = 1000): Unit = {
    val spark = batch.sparkSession
    if (batchId == 0L) {
      Dedup.minhashCandidates(batch, "doc_id", "text", maxBucket = maxBucket)
        .write.mode("overwrite").parquet(batchDir(outDir, batchId))
      Dedup.writeMinhashIndex(batch, "doc_id", "text", table)
    } else {
      val idx = Dedup.openMinhashIndex(spark, table)
      Dedup.incrementalCandidates(batch, "doc_id", "text", idx,
          maxBucket = maxBucket, excludeEpoch = Some(batchId))
        .write.mode("overwrite").parquet(batchDir(outDir, batchId))
      Dedup.appendToMinhashIndex(batch, "doc_id", "text", table, epoch = batchId)
    }
  }

  /** Start the stream over a parquet file source of (doc_id, text)
    * shards. Restarting with the same checkpoint resumes from committed
    * offsets; a replayed batch rewrites its own outputs (see object
    * doc). */
  def start(spark: SparkSession, inDir: String, table: String,
            outDir: String, checkpointDir: String,
            maxBucket: Int = 1000): StreamingQuery =
    spark.readStream.schema(ShardSchema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        dedupBatch(b.toDF(), id, table, outDir, maxBucket))
      .start()
}
