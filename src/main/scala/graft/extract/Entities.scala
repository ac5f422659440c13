package graft.extract

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.model.Entity

/** Entity tagging + the A1 dedup-merge aggregate
  * (processing/entity_extractor.py:364-434).
  *
  * The reference's only deterministic entity source is the heuristic
  * segment classifier (P16) — every model path degrades to nothing when
  * transformers are absent (:57-89), which is the configuration its own
  * tests pin. `tagEntities` reproduces that path: sentence segments
  * classified amount/date/identifier, mapped to AMOUNT/START_DATE/
  * CONTRACT_ID (:338-346) with the domain-knowledge confidence 0.85.
  *
  * A1 dedup comes in two scale shapes:
  *  - `dedupWindow`: row_number over (doc, normalized_text, type) — the
  *    Catalyst-native form;
  *  - `DedupEntitiesAgg`: a typed `Aggregator` usable per doc group for
  *    single-pass map-side combine (SURVEY §2.10).
  * Tie-break note: Python keeps first-encountered order among equal
  * confidences — meaningless under a shuffle, so both shapes use the
  * total order (confidence desc, start_pos asc, text asc); they are
  * property-tested equal to each other and to Rules.dedupEntities
  * whenever confidences are distinct. */
object Entities {

  def tagEntities(docId: String, text: String): Seq[Entity] = {
    var cursor = 0
    Rules.segments(Option(text).getOrElse("")).map { case (seg, cls) =>
      val start = {
        val i = text.indexOf(seg, cursor)
        // advance PAST the match: repeated identical segments must report
        // their own occurrence's position, not all collapse onto the first
        if (i >= 0) { cursor = i + seg.length; i } else 0
      }
      val etype = cls match {
        case "amount" => "AMOUNT"
        case "date" => "START_DATE"
        case _ => "CONTRACT_ID"
      }
      Entity(seg, etype, start, start + seg.length, 0.85)
    }
  }

  /** Window shape of A1 over a DataFrame with
    * (doc_id, text, entity_type, start_pos, end_pos, confidence). */
  def dedupWindow(entities: DataFrame): DataFrame = {
    val norm = udf((t: String, k: String) => Rules.normalizeEntity(k, t))
    val w = Window
      .partitionBy(col("doc_id"), norm(col("text"), col("entity_type")), col("entity_type"))
      .orderBy(desc("confidence"), asc("start_pos"), asc("text"))
    entities.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Typed single-pass A1 aggregator: per-group keep-best by the total
    * order above. Partial aggregation (map-side combine) comes free. The
    * buffer is a Catalyst-encoded map (key = normalized_text + type), NOT
    * a Kryo blob: serialization only happens at the partial->final shuffle
    * boundary, and a structured buffer keeps that exchange Tungsten-format
    * (columnar, comparable) instead of opaque bytes. Within a partition the
    * buffer object is mutated in place, so reduce stays O(1) per row. */
  object DedupEntitiesAgg
      extends Aggregator[Entity, mutable.Map[String, Entity], Seq[Entity]] {
    private def better(a: Entity, b: Entity): Entity = {
      val c = java.lang.Double.compare(b.confidence, a.confidence)
      if (c != 0) { if (c < 0) a else b }
      else if (a.start_pos != b.start_pos) { if (a.start_pos < b.start_pos) a else b }
      else if (a.text <= b.text) a else b
    }
    // key rendered as a single string: normalized text cannot contain the
    // NUL separator (cannot appear in regex-extracted text), so the packing
    // is injective
    private def keyOf(e: Entity): String =
      Rules.normalizeEntity(e.entity_type, e.text) + "\u0000" + e.entity_type
    def zero: mutable.Map[String, Entity] = mutable.Map.empty
    def reduce(buf: mutable.Map[String, Entity], e: Entity): mutable.Map[String, Entity] = {
      buf.updateWith(keyOf(e)) { case Some(old) => Some(better(old, e)); case None => Some(e) }
      buf
    }
    def merge(a: mutable.Map[String, Entity], b: mutable.Map[String, Entity]): mutable.Map[String, Entity] = {
      b.foreach { case (k, e) =>
        a.updateWith(k) { case Some(old) => Some(better(old, e)); case None => Some(e) }
      }
      a
    }
    def finish(buf: mutable.Map[String, Entity]): Seq[Entity] =
      buf.values.toSeq.sortBy(e => (-e.confidence, e.start_pos, e.text))
    def bufferEncoder: Encoder[mutable.Map[String, Entity]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[mutable.Map[String, Entity]]()
    def outputEncoder: Encoder[Seq[Entity]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entity]]()
  }
}
