package graft.io

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Doc

/** Iceberg-snapshot-SHAPED checkpointing over plain parquet (SURVEY §7.4.4:
  * no Iceberg jar ships in this sandbox, so the table-format seam is kept
  * explicit — `Snapshots` presents the snapshot-id / time-travel API a
  * real Iceberg catalog would back; swapping in Iceberg changes only this
  * object).
  *
  * Layout per output dir:
  *   contracts/snapshot_id=<id>/   extraction output, one partition per snapshot
  *   lineage/snapshot_id=<id>/     per-(doc, stage) ledger, same layout
  *   _manifest_<id>.json           snapshot manifest: id, sequence, counts
  *
  * Resume contract (north rule): a job restarted against the same outDir
  * processes exactly the docs without an 'ok' ledger record in the latest
  * snapshot — `Pipeline.resume`'s anti-join. Writes are idempotent per
  * snapshot partition (dynamic overwrite), so replaying a
  * partially-written snapshot is safe.
  *
  * Time travel (`asOf`): the state as of snapshot N = the partitions of
  * snapshots with sequence <= N's — a partition-pruned filter, mirroring
  * the reference's reversible operation ledger
  * (system_contract_organizer.py:339-362, replay-to-a-point). */
object Snapshots {

  case class Manifest(snapshotId: String, docsOk: Long, docsErr: Long,
                      spansSeen: Long, seq: Long)

  // tolerant of trailing fields (e.g. the listener-bus "execution" object);
  // seq is optional for manifests written before it existed (treated as
  // file-order)
  private val ManifestRe =
    """\{"snapshot_id":"([^"]+)","docs_ok":(\d+),"docs_err":(\d+),"spans_seen":(\d+)(?:,"seq":(\d+))?.*\}""".r

  /** Manifests in snapshot-sequence order. */
  def list(outDir: String): Seq[Manifest] = {
    val dir = Paths.get(outDir)
    if (!Files.exists(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("_manifest_"))
      .toSeq.sortBy(_.getFileName.toString)
      .zipWithIndex
      .flatMap { case (p, i) =>
        Files.readString(p) match {
          case ManifestRe(id, ok, err, spans, seq) =>
            Some(Manifest(id, ok.toLong, err.toLong, spans.toLong,
              Option(seq).map(_.toLong).getOrElse(i.toLong)))
          case _ => None
        }
      }
      .sortBy(m => (m.seq, m.snapshotId))
  }

  def latest(outDir: String): Option[Manifest] = list(outDir).lastOption

  def ledger(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val p = Paths.get(outDir, "lineage")
    if (Files.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** The contracts + ledger state AS OF a snapshot: partitions of every
    * snapshot up to and including it, with contracts resolved keep-latest
    * per doc (a doc reprocessed in a later included snapshot shows that
    * later row). */
  case class SnapshotView(snapshotId: String, contracts: DataFrame, ledger: DataFrame)

  def asOf(spark: SparkSession, outDir: String, snapshotId: String): SnapshotView = {
    val ms = list(outDir)
    val target = ms.find(_.snapshotId == snapshotId)
      .getOrElse(sys.error(s"unknown snapshot '$snapshotId' in $outDir " +
        s"(have: ${ms.map(_.snapshotId).mkString(", ")})"))
    val included = ms.filter(_.seq <= target.seq)
    val ids = included.map(_.snapshotId)
    val led = spark.read.parquet(s"$outDir/lineage")
      .filter(col("snapshot_id").isin(ids: _*)) // partition-pruned
    import spark.implicits._
    val seqDf = included.map(m => (m.snapshotId, m.seq)).toDF("snapshot_id", "seq")
    // keep-latest per doc across the included snapshots: tiny broadcast of
    // the (snapshot, seq) order, window by doc over seq desc
    val contracts = spark.read.parquet(s"$outDir/contracts")
      .filter(col("snapshot_id").isin(ids: _*))
      .join(broadcast(seqDf), "snapshot_id")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("contract.doc_id")).orderBy(desc("seq"))))
      .filter(col("_rn") === 1)
      .drop("_rn", "seq")
    SnapshotView(snapshotId, contracts, led)
  }

  /** Resume against the ledger AS OF a snapshot: docs without an 'ok'
    * extract record at that point — i.e. everything later snapshots did
    * (or new work) gets reprocessed. */
  def resumeAsOf(docs: Dataset[Doc], outDir: String, snapshotId: String): Dataset[Doc] =
    graft.pipeline.Pipeline.resume(docs, asOf(docs.sparkSession, outDir, snapshotId).ledger)

  /** Docs still pending under the latest snapshot (all docs if none). */
  def pending(spark: SparkSession, docs: Dataset[Doc], outDir: String): Dataset[Doc] =
    ledger(spark, outDir) match {
      case Some(l) => graft.pipeline.Pipeline.resume(docs, l)
      case None => docs
    }
}
