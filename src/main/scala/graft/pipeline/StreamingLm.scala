package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ops.Lm

/** Streaming maintenance of the bigram-LM counts: document shards land as
  * parquet files; each micro-batch folds its bigram statistics into the
  * persisted count table as its own epoch (one SHARD-scale aggregate —
  * the corpus is never re-read) and publishes the shard's typicality
  * scores under the model CURRENT AS OF that batch. The LM keeps pace
  * with the corpus the way Mix's stats do — the always-fresh form of t14.
  *
  * Exactly-once without markers (the StreamingDedup/StreamingMix
  * contract):
  *  - batch 0 CREATES the model (full overwrite, incl. the per-language
  *    out-of-distribution cuts — idempotent);
  *  - an epoch append is a dynamic-partition overwrite, so a replayed
  *    batch rewrites its own epoch byte-identically instead of
  *    double-counting;
  *  - the published scores derive from the post-append counts —
  *    identical on first run and on replay — and overwrite the batch's
  *    own directory.
  * Compact the counts (`Lm.compactCounts`) only while the stream is
  * stopped: a replayed batch whose epoch was folded is refused loudly,
  * which is the correct surface for that misuse. */
object StreamingLm {

  /** Minimal shard schema the LM tier needs. */
  val ShardSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  private def batchDir(outDir: String, batchId: Long): String =
    f"$outDir/batch=$batchId%06d"

  /** One micro-batch: fold the shard's counts in, publish its scores
    * under the current model. Idempotent under replay (see object doc). */
  def lmBatch(batch: DataFrame, batchId: Long, lmPath: String,
              outDir: String): Unit = {
    val spark = batch.sparkSession
    if (batchId == 0L) Lm.writeModel(batch, lmPath)
    else Lm.appendCounts(batch, lmPath, epoch = batchId)
    Lm.score(batch, Lm.openModel(spark, lmPath))
      .write.mode("overwrite").parquet(batchDir(outDir, batchId))
  }

  /** Start the stream over a parquet file source of (doc_id, text, lang)
    * shards. Restarting with the same checkpoint resumes from committed
    * offsets; a replayed batch rewrites its own outputs. */
  def start(spark: SparkSession, inDir: String, lmPath: String,
            outDir: String, checkpointDir: String): StreamingQuery =
    spark.readStream.schema(ShardSchema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        lmBatch(b.toDF(), id, lmPath, outDir))
      .start()
}
