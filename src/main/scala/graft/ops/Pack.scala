package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — assign every document its token offset in the
  * doc_id-ordered corpus concatenation and the training-sequence (pack)
  * ids it lands in, the standard LLM batch-packing layout (fixed seqLen
  * rows, documents straddle pack boundaries).
  *
  * The semantics are a GLOBAL exclusive prefix sum in doc_id order. A
  * window `sum() OVER (ORDER BY doc_id)` computes it — but a global-order
  * window collapses to ONE partition and is exactly what cannot run at
  * 10^12 docs. This operator is the distributed form — the classic
  * two-pass prefix sum:
  *
  *  1. bucket docs into P contiguous id ranges (pid = id*P/(maxId+1) —
  *     arithmetic on the key, deterministic, no sampled range boundaries);
  *  2. per-bucket token totals (one small hash agg, P rows) → driver
  *     computes the exclusive prefix over bucket order → broadcast;
  *  3. per-bucket local prefix (sorted fold inside each group) + the
  *     bucket's global offset.
  *
  * Identical output to the window form — PackSpec pins value-equality
  * against the t07_seq_pack oracle SQL (which keeps the window shape for
  * DuckDB) and repartition invariance. Scale: no global sort, no single
  * partition; each group holds ~N/P docs and only (pid, total) rows reach
  * the driver. */
object Pack {

  /** (idCol, n_tokens, offset, first_pack, last_pack) per doc. `tokCol`
    * must be a non-negative int column; docs with 0 tokens get
    * last_pack = first_pack (empty span).
    *
    * Sizing contract: a bucket (~N/partitions docs of (id, ntok) longs) is
    * materialized and sorted inside one task, and `partitions` (pid,
    * total) rows reach the driver — so size partitions ≈ N/10^6: buckets
    * stay ~16 MB and even 10^12 docs need only 10^6 driver rows. The
    * default 64 is a test-scale setting, not a corpus-scale one. */
  def packOffsets(docs: DataFrame, idCol: String, tokCol: String,
                  seqLen: Int, partitions: Int = 64): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(tokCol).cast("long").as("ntok"))
    val bounds = base.agg(count("*"), min("id"), max("id"), min("ntok")).collect()(0)
    // empty input: min/max are NULL — return an empty typed frame instead
    // of an opaque NPE from getLong
    if (bounds.getLong(0) == 0L)
      return spark.emptyDataset[(Long, Long, Long, Long, Long)]
        .toDF(idCol, "n_tokens", "offset", "first_pack", "last_pack")
    val maxId = bounds.getLong(2)
    require(bounds.getLong(1) >= 0,
      s"packOffsets: ids must be non-negative (min = ${bounds.getLong(1)}) — " +
        "the arithmetic bucket assignment id*P/(maxId+1) assumes a dense non-negative key")
    require(bounds.getLong(3) >= 0,
      s"packOffsets: token counts must be non-negative (min = ${bounds.getLong(3)})")
    // id*partitions and maxId+1 run in Long column math under ANSI mode —
    // guard both so sparse huge ids fail with the fix, not an overflow
    // error (the strict < also covers partitions=1, where the division
    // guard alone admits maxId=Long.MaxValue and maxId+1 wraps negative)
    require(maxId < Long.MaxValue && maxId <= Long.MaxValue / partitions,
      s"packOffsets: maxId=$maxId with partitions=$partitions would overflow " +
        "64-bit bucket arithmetic — densify ids (e.g. zipWithIndex) first")
    val withPid = base.withColumn("pid",
      (col("id") * partitions / (maxId + 1)).cast("int"))
    // pass 1: per-bucket totals -> exclusive prefix per bucket (driver,
    // P rows only)
    val totals = withPid.groupBy("pid").agg(sum("ntok").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bucketOffset: Map[Int, Long] = {
      var acc = 0L
      (0 until partitions).map { p =>
        val o = p -> acc
        acc += totals.getOrElse(p, 0L)
        o
      }.toMap
    }
    // pass 2: local sorted fold per bucket + the bucket's global offset
    withPid.as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroups { (pid, it) =>
        var off = bucketOffset(pid)
        it.toSeq.sortBy(_._1).map { case (id, ntok, _) =>
          val o = off
          off += ntok
          val first = o / seqLen
          val last = if (ntok == 0) first else (o + ntok - 1) / seqLen
          (id, ntok, o, first, last)
        }
      }
      .toDF(idCol, "n_tokens", "offset", "first_pack", "last_pack")
  }
}
