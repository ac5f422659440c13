package graft.extract

import scala.collection.mutable
import graft.model.{ContractRow, DateHit, Doc, Span}

/** Whole-document extraction: composes the `Rules` scalar operators into the
  * reference's two parse paths (SURVEY §3.2):
  *
  *  - `parseBlocks` — the JSON/block path (services/contract_parser.py:
  *    80-108, 196-239, 282-306, 341-375): per-block first-hit-wins metadata
  *    fold over the ordered span sequence. This is the engine's primary
  *    path for the interleaved corpus (spans ARE blocks).
  *  - `parseMarkdown` — the markdown path (:50-78, 110-194): whole-content
  *    regex extraction with bold fallbacks.
  *
  * Faithfulness notes:
  *  - JSON-path `metadata.update(parties)` (:228-231) can OVERWRITE an
  *    already-found party while the other is still missing — reproduced.
  *  - JSON-path type detection runs over Python `str(data)` (:235). Block
  *    values there are separated by `', '`/dict syntax, so multi-word
  *    keywords can never span two blocks; we join block kinds+texts with
  *    '\n' which has the same no-cross-block-match property.
  *  - The JSON path extracts NO total_value (the reference simply doesn't).
  *  - The markdown path's labeled/bold amount regex cannot match when a
  *    currency symbol precedes the digits (`US$ 50` -> optional-char class
  *    then `\s*` then digits fails on `$`) — so most fixture amounts come
  *    back None; pinned by tests/test_e2e_workflow.py:92-97.
  */
object Extract {

  /** Deterministic markdown render of a span sequence (SRC1 semantics,
    * inverse of Marker block parse). Headings -> `#`/`##`, tables verbatim,
    * media -> image link, html spans excluded (fed to P26 instead). */
  def markdownOf(spans: Seq[Span]): String = {
    val ordered = spans.sortBy(_.offset)
    val sb = new StringBuilder
    var firstHeading = true
    for (s <- ordered) s.kind match {
      case "heading" =>
        sb.append(if (firstHeading) "# " else "## ").append(s.text).append("\n\n")
        firstHeading = false
      case "paragraph" | "table" =>
        sb.append(s.text).append("\n\n")
      case "media" =>
        sb.append(s"![figure](${s.media_ref})").append("\n\n")
      case _ => // html handled by stripBoilerplate
    }
    sb.result()
  }

  // precompiled: String.replaceAll would recompile both patterns per html
  // span — this sits inside the per-doc extraction hot path
  private val TagP = java.util.regex.Pattern.compile("<[^>]+>")
  private val WsP = java.util.regex.Pattern.compile("\\s+")

  /** P26 — boilerplate strip over html spans: keep spans whose text density
    * and link density pass the thresholds, rewriting them as paragraph
    * spans of their tag-stripped text. Non-html spans pass through. */
  def stripBoilerplate(spans: Seq[Span],
                       tauText: Double = 0.35, tauLink: Double = 0.33): Seq[Span] =
    spans.flatMap { s =>
      if (s.kind != "html") Some(s)
      else if (Rules.isContentHtml(s.text, tauText, tauLink)) {
        val stripped =
          WsP.matcher(TagP.matcher(s.text).replaceAll(" ")).replaceAll(" ").trim
        Some(Span("paragraph", stripped, s.media_ref, s.offset))
      } else None
    }

  /** Faithful JSON/block-path metadata fold (contract_parser.py:196-239). */
  final class BlockMeta {
    var title: Option[String] = None
    var number: Option[String] = None
    var currency: Option[String] = None
    var dates: Seq[DateHit] = Seq.empty
    var client: Option[String] = None
    var vendor: Option[String] = None

    def feed(kind: String, text: String): Unit = {
      if (kind == "heading") {
        // Python truthiness: an empty-string title is overwritten by the
        // next heading (contract_parser.py:203-205).
        if (title.forall(_.isEmpty)) title = Some(Option(text).getOrElse("").trim)
      } else if (kind == "paragraph") {
        val t = Option(text).getOrElse("")
        val lc = t.toLowerCase(java.util.Locale.ROOT)
        if (number.isEmpty && Rules.mayHaveNumber(lc))
          number = Rules.contractNumberPlain(t)
        if (currency.isEmpty && Rules.mayHaveCurrency(lc))
          currency = Rules.currency(t)
        if (dates.isEmpty && Rules.mayHaveDate(t)) {
          val d = Rules.extractDates(t)
          if (d.nonEmpty) dates = d
        }
        if (client.isEmpty || vendor.isEmpty) {
          val (c, v) = Rules.partiesLc(t, lc)
          // Python dict.update: overwrite whatever the paragraph yielded.
          if (c.isDefined) client = c
          if (v.isDefined) vendor = v
        }
      }
    }
  }

  /** JSON/block path over ordered spans -> ContractRow. */
  def parseBlocks(docId: String, spans: Seq[Span]): ContractRow = {
    val ordered = spans.sortBy(_.offset)
    val blocks = ordered.filter(s => s.kind == "heading" || s.kind == "paragraph" || s.kind == "table")
    val meta = new BlockMeta
    blocks.foreach(b => meta.feed(b.kind, b.text))
    // entities content: ' '.join over every block with non-empty text (:346)
    val entityContent = blocks.iterator.map(_.text).filter(t => t != null && t.nonEmpty).mkString(" ")
    val lcEntity = entityContent.toLowerCase(java.util.Locale.ROOT)
    // type detect over str(data)-equivalent: '\n' join prevents cross-block
    // matches; built lowered in one pass (hot path)
    val typeLc = {
      val sb = new StringBuilder
      blocks.foreach { b =>
        sb.append(b.kind).append('\n')
        if (b.text != null) sb.append(b.text.toLowerCase(java.util.Locale.ROOT))
        sb.append('\n')
      }
      if (sb.nonEmpty) sb.setLength(sb.length - 1)
      sb.result()
    }
    val ctype = Rules.contractTypeLc(typeLc)
    val sections = Rules.sectionsFromBlocks(blocks)
    val clauses = Rules.keyClausesLc(lcEntity)
    val tableBlocks = blocks.count(_.kind == "table")
    build(docId, meta.title, meta.number, meta.currency, None, meta.dates,
      meta.client, meta.vendor, ctype, Rules.emails(entityContent),
      Rules.cnpjCpf(entityContent), tableBlocks, clauses, sections.size)
  }

  /** Markdown path over whole content -> ContractRow. */
  def parseMarkdown(docId: String, content: String): ContractRow = {
    val title = Rules.title(content)
    val number = Rules.contractNumber(content)
    val cur = Rules.currency(content)
    val value = Rules.totalValue(content)
    val dates = Rules.datesMarkdown(content)
    val (client, vendor) = Rules.partiesMarkdown(content)
    val ctype = Rules.contractType(content)
    val sections = Rules.sectionsMarkdown(content)
    val clauses = Rules.keyClauses(content)
    val (tableCount, _) = Rules.tables(content)
    build(docId, title, number, cur, value, dates, client, vendor, ctype,
      Rules.emails(content), Rules.cnpjCpf(content), tableCount, clauses,
      sections.size)
  }

  /** Shared `_create_contract_model` semantics (contract_parser.py:501-542)
    * + P23 confidence. Defaults: number/parties "N/A", currency "USD",
    * type MSA, name = title else doc id (filename stand-in). */
  private def build(docId: String, title: Option[String], number: Option[String],
      cur: Option[String], value: Option[Double], dates: Seq[DateHit],
      client: Option[String], vendor: Option[String], ctype: Option[String],
      emails: Seq[String], cnpj: Seq[String], tableCount: Int,
      clauses: Seq[String], nSections: Int): ContractRow = {
    val conf = Rules.confidence(
      title.exists(_.nonEmpty), number.exists(_.nonEmpty),
      client.exists(_.nonEmpty) && vendor.exists(_.nonEmpty),
      dates.nonEmpty, nSections, clauses.size)
    ContractRow(
      doc_id = docId,
      title = title.orNull,
      contract_number = number.getOrElse("N/A"),
      currency = cur.getOrElse("USD"),
      total_value = value,
      effective_date = dates.headOption.map(_.date).orNull,
      expiration_date = if (dates.size >= 2) dates(1).date else null,
      client_name = client.getOrElse("N/A"),
      vendor_name = vendor.getOrElse("N/A"),
      contract_type = ctype.getOrElse("MSA"),
      emails = emails,
      cnpj_cpf = cnpj,
      table_count = tableCount,
      key_clauses = clauses,
      n_sections = nSections,
      confidence = conf)
  }

  /** Full per-document pipeline: boilerplate strip -> block parse. */
  def extractDoc(doc: Doc): ContractRow =
    parseBlocks(doc.doc_id, stripBoilerplate(doc.spans))

  /** Business-rule validation (validation/schema.py:168-210) as an error
    * array per contract. */
  def validate(c: ContractRow): Seq[String] = {
    val errors = mutable.ArrayBuffer.empty[String]
    val name = Option(c.title).getOrElse(c.doc_id)
    if (name.isEmpty || name == "N/A") errors += "Contract must have a valid name"
    if (c.contract_number.isEmpty || c.contract_number == "N/A")
      errors += "Contract must have a valid contract number"
    if (c.client_name.isEmpty || c.client_name == "N/A")
      errors += "Contract must have a valid client name"
    if (c.vendor_name.isEmpty || c.vendor_name == "N/A")
      errors += "Contract must have a valid vendor name"
    if (c.effective_date != null && c.expiration_date != null
        && c.effective_date >= c.expiration_date)
      errors += "Effective date must be before expiration date"
    c.total_value.foreach { v =>
      if (v <= 0) errors += "Contract total value must be positive"
      if (c.currency == null || c.currency.isEmpty)
        errors += "Contract must have currency when value is specified"
    }
    errors.toSeq
  }

  // -------------------------------------------------------------------
  // Salted mega-doc path: per-chunk partial evidence + order-aware merge
  // (SURVEY §4 "salted repartitioning for skewed mega-documents").
  // -------------------------------------------------------------------

  /** Compact per-chunk evidence. All first-hit fields carry the offset of
    * the span that produced them so the merge can replay global
    * first-hit-wins order. `clauseHits` are per-chunk clause names;
    * `headText`/`tailText` are boundary windows so multi-word clauses that
    * straddle a chunk boundary (joined with ' ' in the reference) are not
    * lost. `headings` carries (offset, lowercased text, hasFollowingPara)
    * for exact section reconstruction counts. */
  case class ChunkEvidence(
      chunkIdx: Int,
      sawHeading: Boolean,
      titleOff: Int, title: String,
      numberOff: Int, number: String,
      currencyOff: Int, currency: String,
      datesOff: Int, dates: Seq[DateHit],
      partyEvents: Seq[(Int, String, String)], // (offset, clientOrNull, vendorOrNull)
      emails: Seq[String], cnpj: Seq[String],
      tableCount: Int,
      clauseHits: Seq[String],
      headText: String, tailText: String,
      sectionEvents: Seq[(Int, String, Boolean)], // (offset, headingLower|null=para, isHeading)
      typeText: String)

  private val NoHit = Int.MaxValue

  /** Evidence for one ordered chunk of spans. */
  def chunkEvidence(chunkIdx: Int, chunk: Seq[Span]): ChunkEvidence = {
    val blocks = chunk.sortBy(_.offset)
      .filter(s => s.kind == "heading" || s.kind == "paragraph" || s.kind == "table")
    var tOff = NoHit; var t = ""
    var nOff = NoHit; var n = ""
    var cOff = NoHit; var c = ""
    var dOff = NoHit; var ds: Seq[DateHit] = Seq.empty
    val partyEv = mutable.ArrayBuffer.empty[(Int, String, String)]
    val secEv = mutable.ArrayBuffer.empty[(Int, String, Boolean)]
    for (b <- blocks) {
      val text = Option(b.text).getOrElse("")
      if (b.kind == "heading") {
        if (tOff == NoHit && text.trim.nonEmpty) { tOff = b.offset; t = text.trim }
        secEv += ((b.offset, text.toLowerCase(java.util.Locale.ROOT), true))
      } else if (b.kind == "paragraph") {
        val lc = text.toLowerCase(java.util.Locale.ROOT)
        if (nOff == NoHit && Rules.mayHaveNumber(lc))
          Rules.contractNumberPlain(text).foreach { x => nOff = b.offset; n = x }
        if (cOff == NoHit && Rules.mayHaveCurrency(lc))
          Rules.currency(text).foreach { x => cOff = b.offset; c = x }
        if (dOff == NoHit && Rules.mayHaveDate(text)) {
          val d = Rules.extractDates(text)
          if (d.nonEmpty) { dOff = b.offset; ds = d }
        }
        val (pc, pv) = Rules.partiesLc(text, lc)
        if (pc.isDefined || pv.isDefined)
          partyEv += ((b.offset, pc.orNull, pv.orNull))
        secEv += ((b.offset, null, false))
      }
    }
    val entityContent = blocks.iterator.map(_.text).filter(x => x != null && x.nonEmpty).mkString(" ")
    val typeText = blocks.iterator.flatMap(b => Iterator(b.kind, Option(b.text).getOrElse(""))).mkString("\n")
    ChunkEvidence(chunkIdx, blocks.exists(_.kind == "heading"), tOff, t, nOff, n, cOff, c, dOff, ds,
      partyEv.toSeq, Rules.emails(entityContent), Rules.cnpjCpf(entityContent),
      blocks.count(_.kind == "table"), Rules.keyClauses(entityContent),
      entityContent.take(64), entityContent.takeRight(64), secEv.toSeq, typeText)
  }

  /** Merge chunk evidences (sorted by chunkIdx) into the same ContractRow
    * the direct path produces. */
  def mergeEvidence(docId: String, evs0: Seq[ChunkEvidence]): ContractRow = {
    val evs = evs0.sortBy(_.chunkIdx)
    def first(off: ChunkEvidence => Int, v: ChunkEvidence => String): Option[String] =
      evs.filter(e => off(e) != NoHit).sortBy(off).headOption.map(v)
    // Python truthiness edge: headings exist but all strip to "" -> the
    // reference leaves title = "" (key set), not absent.
    val title = first(_.titleOff, _.title)
      .orElse(if (evs.exists(_.sawHeading)) Some("") else None)
    val number = first(_.numberOff, _.number)
    val currency = first(_.currencyOff, _.currency)
    val dates = evs.filter(_.datesOff != NoHit).sortBy(_.datesOff)
      .headOption.map(_.dates).getOrElse(Seq.empty)
    // replay party events in offset order with the update quirk
    var client: Option[String] = None; var vendor: Option[String] = None
    for ((_, c, v) <- evs.flatMap(_.partyEvents).sortBy(_._1)) {
      if (client.isEmpty || vendor.isEmpty) {
        if (c != null) client = Some(c)
        if (v != null) vendor = Some(v)
      }
    }
    val emails = evs.flatMap(_.emails).distinct.sorted
    val cnpj = evs.flatMap(_.cnpj).distinct.sorted
    val tableCount = evs.map(_.tableCount).sum
    // clause flags: per-chunk hits + boundary windows for straddling
    // multi-word terms. Chunks with no text content are skipped so the
    // boundary chain mirrors the ' '-join of the full entity content
    // (an all-media chunk between two text chunks must not break the
    // window).
    val textChunks = evs.filter(e => e.headText.nonEmpty || e.tailText.nonEmpty)
    val boundaryText = textChunks.sliding(2).collect {
      case Seq(a, b) => a.tailText + " " + b.headText
    }.mkString("\n")
    val clauses = (evs.flatMap(_.clauseHits) ++ Rules.keyClauses(boundaryText))
      .distinct.sortBy(Rules.SectionHeaders.indexOf)
    // sections: replay heading/para events in offset order
    val secEvents = evs.flatMap(_.sectionEvents).sortBy(_._1)
    val sectionKeys = mutable.LinkedHashSet.empty[String]
    var currentHeading: String = null
    var paraSeen = false
    for ((_, head, isHeading) <- secEvents) {
      if (isHeading) {
        if (currentHeading != null && paraSeen) sectionKeys += currentHeading
        currentHeading = head; paraSeen = false
      } else if (currentHeading != null) paraSeen = true
    }
    if (currentHeading != null && paraSeen) sectionKeys += currentHeading
    val ctype = Rules.contractType(evs.map(_.typeText).mkString("\n"))
    val conf = Rules.confidence(
      title.exists(_.nonEmpty), number.exists(_.nonEmpty),
      client.exists(_.nonEmpty) && vendor.exists(_.nonEmpty),
      dates.nonEmpty, sectionKeys.size, clauses.size)
    ContractRow(docId, title.orNull, number.getOrElse("N/A"),
      currency.getOrElse("USD"), None,
      dates.headOption.map(_.date).orNull,
      if (dates.size >= 2) dates(1).date else null,
      client.getOrElse("N/A"), vendor.getOrElse("N/A"),
      ctype.getOrElse("MSA"), emails, cnpj, tableCount, clauses,
      sectionKeys.size, conf)
  }
}
