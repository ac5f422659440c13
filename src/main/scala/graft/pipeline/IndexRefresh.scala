package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Snapshots
import graft.ops.Dedup

/** Glue between the snapshot changes feed and the persisted dedup index —
  * the composition a 100 TB pipeline actually runs: extraction commits a
  * snapshot, a downstream refresher consumes exactly the delta (from, to]
  * (`Snapshots.changes`, partition-pruned to the newer snapshots) and
  * folds the newly seen docs into the minhash bucket index as one epoch.
  * Neither side rescans corpus-scale state: the delta bounds every join's
  * broadcast side, and the index contributes one streaming pass.
  *
  * Epoch = the TARGET snapshot's sequence number, so the refresh is
  * exactly-once per snapshot: a replay (or a second refresher) sees the
  * epoch already present and returns without touching the index. The
  * cursor contract: consume the feed contiguously (each refresh's `from`
  * is the previous refresh's `to`) and maintain the index exclusively
  * through this refresher — manual `appendToMinhashIndex` epochs would
  * collide with future snapshot sequences.
  *
  * Docs REPROCESSED by the target snapshot are already indexed (their
  * bucket rows derive from source text, which re-extraction does not
  * change) and are skipped via an anti-join, keeping the index's
  * disjoint-ids invariant; the skip count is surfaced in the result. */
object IndexRefresh {

  /** `skippedExisting` = delta docs already present in the index
    * (reprocessed by the target snapshot, not new). */
  case class Result(epoch: Long, appended: Long, skippedExisting: Long,
                    alreadyRefreshed: Boolean)

  /** Fold the docs that became authoritative in (fromId, toId] into the
    * minhash index `table`. `source` maps the snapshot's doc ids to the
    * raw text being indexed (`idCol` values must equal `contract.doc_id`
    * in the snapshot output). */
  def minhashFromChanges(spark: SparkSession, outDir: String,
                         fromId: String, toId: String,
                         source: DataFrame, idCol: String, textCol: String,
                         table: String): Result = {
    val epoch = Snapshots.list(outDir).find(_.snapshotId == toId)
      .getOrElse(sys.error(s"unknown snapshot '$toId' in $outDir")).seq
    // seq 0 is the base build's epoch: the first snapshot's docs enter the
    // index via writeMinhashIndex, refreshes consume the feed after it
    require(epoch > 0L,
      s"'$toId' is the first snapshot (seq 0) — build the base index from " +
        "it with writeMinhashIndex; refreshes consume later snapshots")
    if (Dedup.epochInMinhashIndex(spark, table, epoch))
      return Result(epoch, 0L, 0L, alreadyRefreshed = true)
    val deltaIds = Snapshots.changes(spark, outDir, fromId, toId)
      .select(col("contract.doc_id").as("_delta_id")).distinct()
    val changed = source.join(broadcast(deltaIds),
      source(idCol) === col("_delta_id"), "left_semi")
    // delta ids already indexed: ONE streaming pass over the bucket
    // table's band-0 rows (every doc has exactly one) against the
    // broadcast delta — the corpus-scale side never shuffles
    val existing = spark.table(table).filter(col("band") === 0)
      .join(broadcast(changed.select(col(idCol).as("_cid"))),
        col("id") === col("_cid"), "left_semi")
      .select(col("id").as("_eid")).distinct()
    val toAppend = changed.join(broadcast(existing),
      changed(idCol) === col("_eid"), "left_anti")
    val (nChanged, nAppend) = (changed.count(), toAppend.count())
    Dedup.appendToMinhashIndex(toAppend, idCol, textCol, table, epoch = epoch)
    Result(epoch, nAppend, nChanged - nAppend, alreadyRefreshed = false)
  }
}
