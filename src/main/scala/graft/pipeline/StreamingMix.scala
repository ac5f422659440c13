package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.ops.Mix

/** Streaming maintenance of the domain-mix stats: document shards land as
  * parquet files; each micro-batch folds into the stats table as its own
  * epoch (one SHARD-scale aggregate — the corpus is never re-read) and
  * publishes the sampling rates CURRENT AS OF that batch under the
  * batch's directory. Downstream mix decisions read the latest rates
  * snapshot and run `Mix.assign` — the always-fresh form of d14.
  *
  * Exactly-once without markers (the StreamingDedup contract):
  *  - batch 0 CREATES the stats table (full overwrite — idempotent);
  *  - an epoch append is a dynamic-partition overwrite, so a replayed
  *    batch rewrites its own epoch byte-identically instead of
  *    double-counting;
  *  - the rates snapshot derives from the post-append stats — identical
  *    on first run and on replay — and overwrites the batch's own
  *    directory.
  * Compact the stats (`Mix.compactStats`) only while the stream is
  * stopped: a replayed batch whose epoch was folded is refused loudly,
  * which is the correct surface for that misuse. */
object StreamingMix {

  /** Minimal shard schema the mix tier needs. */
  val ShardSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType)))

  private def batchDir(outDir: String, batchId: Long): String =
    f"$outDir/batch=$batchId%06d"

  /** One micro-batch: fold the shard in, publish the current rates.
    * Idempotent under replay (see object doc). */
  def mixBatch(batch: DataFrame, batchId: Long, statsPath: String,
               outDir: String): Unit = {
    val spark = batch.sparkSession
    if (batchId == 0L) Mix.writeStats(batch, statsPath)
    else Mix.appendStats(batch, statsPath, epoch = batchId)
    Mix.rates(Mix.openStats(spark, statsPath))
      .coalesce(1) // #domains rows — one file per snapshot
      .write.mode("overwrite").parquet(batchDir(outDir, batchId))
  }

  /** Start the stream over a parquet file source of (doc_id, text, source)
    * shards. Restarting with the same checkpoint resumes from committed
    * offsets; a replayed batch rewrites its own outputs. */
  def start(spark: SparkSession, inDir: String, statsPath: String,
            outDir: String, checkpointDir: String): StreamingQuery =
    spark.readStream.schema(ShardSchema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) =>
        mixBatch(b.toDF(), id, statsPath, outDir))
      .start()
}
