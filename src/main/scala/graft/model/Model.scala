package graft.model

/** Core data model for the extraction engine.
  *
  * Mirrors the reference's layout IR and document/contract models
  * (reference: src/pappermate/models/document.py:30-100 and the Marker
  * block-JSON shape at services/pdf_converter.py:353-359,
  * tests/parser/test_contract_parser.py:56-73) re-expressed as Scala case
  * classes with Catalyst `Encoders.product` derivation.
  *
  * The primary input table (per BASELINE.json `input_hint`) is
  * `(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`.
  * Span order is carried EXPLICITLY by `offset` — Python lists are ordered,
  * Spark shuffles are not, so every reassembly sorts by offset (SURVEY §7.4.1).
  */

/** One typed block of an interleaved document.
  *
  * `kind` ∈ {heading, paragraph, table, figure, media, html} — the
  * reference's Marker block types (services/contract_parser.py:201-231)
  * plus `media`/`html` for the interleaved text+media corpus.
  * `text` is "" for pure media spans; `media_ref` is "" for text spans.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An interleaved document: the engine's primary input row. */
case class Doc(doc_id: String, spans: Seq[Span])

/** A tagged entity span with character offsets
  * (reference: processing/entity_extractor.py:12-20). */
case class Entity(
    text: String,
    entity_type: String,
    start_pos: Int,
    end_pos: Int,
    confidence: Double)

/** An extracted date with its match position in the source text
  * (reference: services/contract_parser.py:377-415 — dates are sorted by
  * `position`; first→effective, second→expiration :509-517). */
case class DateHit(date: String, text: String, position: Int)

/** Flattened extraction result per document — the union of the reference's
  * `Contract` (models/document.py:70-100) and `ContractMetadata`
  * (scripts/system_contract_organizer.py:35-51) fields that the reference's
  * own tests pin (tests/test_e2e_workflow.py:85-104). */
case class ContractRow(
    doc_id: String,
    title: String,              // P1  (null = absent)
    contract_number: String,    // P2  (reference default "N/A")
    currency: String,           // P3  (reference default "USD")
    total_value: Option[Double],// P4
    effective_date: String,     // W4 first date, yyyy-MM-dd
    expiration_date: String,    // W4 second date
    client_name: String,        // P6
    vendor_name: String,        // P6
    contract_type: String,      // P7 (MSA default per contract_parser.py:506)
    emails: Seq[String],        // P8 (sorted for determinism)
    cnpj_cpf: Seq[String],      // P9
    table_count: Int,           // P10
    key_clauses: Seq[String],   // P11 (present clause headers, sorted)
    n_sections: Int,
    confidence: Double)         // P23

/** Per-partition lineage record (north rule; reference template:
  * scripts/system_contract_organizer.py:53-62, op hash :359-362). */
case class LineageRec(
    doc_id: String,
    partition_id: Int,
    stage: String,
    status: String,
    op_hash: String,
    snapshot_id: String,
    ts: Long)
