package graft.io

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.Doc

/** Iceberg-snapshot-SHAPED checkpointing over plain parquet (SURVEY §7.4.4:
  * no Iceberg jar ships in this sandbox, so the table-format seam is kept
  * explicit — `Snapshots` presents the snapshot-id / time-travel-ish API a
  * real Iceberg catalog would back; swapping in Iceberg changes only this
  * object).
  *
  * Layout per output dir:
  *   contracts/            extraction output (parquet)
  *   lineage/              per-(doc, stage) ledger (parquet)
  *   _manifest_<id>.json   snapshot manifest: id, counts
  *
  * Resume contract (north rule): a job restarted against the same outDir
  * processes exactly the docs without an 'ok' ledger record in the latest
  * snapshot — `Pipeline.resume`'s anti-join. Writes are idempotent per
  * doc_id, so replaying a partially-written snapshot is safe. */
object Snapshots {

  case class Manifest(snapshotId: String, docsOk: Long, docsErr: Long, spansSeen: Long)

  // tolerant of trailing fields (e.g. the listener-bus "execution" object)
  private val ManifestRe = """\{"snapshot_id":"([^"]+)","docs_ok":(\d+),"docs_err":(\d+),"spans_seen":(\d+).*\}""".r

  def list(outDir: String): Seq[Manifest] = {
    val dir = Paths.get(outDir)
    if (!Files.exists(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("_manifest_"))
      .toSeq.sortBy(_.getFileName.toString)
      .flatMap { p =>
        Files.readString(p) match {
          case ManifestRe(id, ok, err, spans) =>
            Some(Manifest(id, ok.toLong, err.toLong, spans.toLong))
          case _ => None
        }
      }
  }

  def latest(outDir: String): Option[Manifest] = list(outDir).lastOption

  def ledger(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val p = Paths.get(outDir, "lineage")
    if (Files.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Docs still pending under the latest snapshot (all docs if none). */
  def pending(spark: SparkSession, docs: Dataset[Doc], outDir: String): Dataset[Doc] =
    ledger(spark, outDir) match {
      case Some(l) => graft.pipeline.Pipeline.resume(docs, l)
      case None => docs
    }
}
