package graft.extract

import java.util.Locale
import java.util.regex.Pattern
import scala.collection.mutable
import graft.model.{DateHit, Entity, Span}

/** Pure-JVM reimplementation of the reference's per-document extraction
  * semantics (CzarX86/PapperMate). Every function here is deterministic,
  * thread-safe (patterns precompiled, no shared mutable state) and is the
  * single source of truth used by the Spark UDFs, the salted/partial
  * extraction path, and the golden-fixture tests.
  *
  * Faithfulness notes (verified against the live reference parser):
  *  - The markdown section-header regex `^#{1,2,3}\s+(.+)$`
  *    (services/contract_parser.py:252) contains an INVALID Python
  *    quantifier, so Python matches the literal text `#{1,2,3}` — real
  *    markdown headers never match and sections always come from the
  *    bold-pattern fallback (:271). We reproduce that exactly.
  *  - The pt-month date pattern (services/contract_parser.py:36) captures
  *    only 2 groups, and `_extract_dates` (:385) requires 3 — month-name
  *    dates are therefore NEVER emitted. We only run the two live patterns.
  *  - `_parse_amount` (:467-483) strips chars in class `[R$US$USD€£\s]`,
  *    which makes `US$ 50,000.00` parse to 50.0 (pinned by
  *    tests/parser/test_contract_parser.py:245).
  *  - `_normalize_entity_text` for AMOUNT (processing/entity_extractor.py:
  *    397-405) keeps only chars `[Vdt .,]` — digits are stripped, so all
  *    same-type amounts collapse to punctuation soup. Reproduced verbatim.
  *  - Python `list(set(...))` dedups (:315,:320) are order-nondeterministic;
  *    we sort for cluster determinism (the reference tests only check
  *    membership).
  */
object Rules {

  /** Compile a pattern ported from Python `re` with Python's semantics:
    * Unicode \w/\b/\s/\d and Unicode case folding for (?i). Java defaults
    * are ASCII-only for both, which diverges on accented pt-BR input —
    * '(?i)número' must match 'NÚMERO', and 'José@mail.com' must NOT yield
    * an email ('é' is a word char, so there is no \b before 's'). Goldens
    * captured from the live reference parser in RulesSpec. */
  private def pyre(p: String): Pattern =
    Pattern.compile(p, Pattern.UNICODE_CHARACTER_CLASS)

  // ---- precompiled patterns (services/contract_parser.py:27-37,115-187) ----
  private val TitleP = pyre("(?m)^#{1,2}\\s+(.+)$")
  private val ContractNumP = pyre(
    "(?i)(?:contract\\s+number|número\\s+do\\s+contrato|ref|reference)[\\s:]*([A-Z0-9\\-_/]+)")
  private val BoldContractNumP =
    pyre("\\*\\*Contract Number:\\*\\*\\s*([A-Z0-9\\-_/]+)")
  private val CurrencyP = pyre("(?i)(R\\$|US\\$|USD|BRL|EUR|€|£)")
  private val AmountP = pyre(
    "(?i)(?:valor|value|amount|total)[\\s:]*([R$US$USD€£]?\\s*[\\d,]+\\.?\\d*)")
  private val BoldAmountP = pyre(
    "\\*\\*Total Value:\\*\\*\\s*([R$US$USD€£]?\\s*[\\d,]+\\.?\\d*)")
  private val EmailP = pyre(
    "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b")
  private val CnpjCpfP = pyre(
    "(?:\\d{2}\\.\\d{3}\\.\\d{3}/\\d{4}-\\d{2}|\\d{3}\\.\\d{3}\\.\\d{3}-\\d{2})")
  private val DateDmyP = pyre("(?i)(\\d{1,2})/(\\d{1,2})/(\\d{4})")
  private val DateYmdP = pyre("(?i)(\\d{4})-(\\d{1,2})-(\\d{1,2})")
  private val BoldEffectiveP =
    pyre("\\*\\*Effective Date:\\*\\*\\s*(\\d{1,2}/\\d{1,2}/\\d{4})")
  private val BoldExpirationP =
    pyre("\\*\\*Expiration Date:\\*\\*\\s*(\\d{1,2}/\\d{1,2}/\\d{4})")
  private val BoldClientP = pyre("\\*\\*Client:\\*\\*\\s*([A-Z][A-Za-z\\s&\\.]+)")
  private val BoldVendorP = pyre("\\*\\*Vendor:\\*\\*\\s*([A-Z][A-Za-z\\s&\\.]+)")
  private val ClientPs = Seq(
    "(?i)(?:cliente|client|contratante|buyer)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?=\\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$)",
    "(?i)(?:empresa|company|corporation)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?=\\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$)"
  ).map(pyre)
  private val VendorPs = Seq(
    "(?i)(?:fornecedor|vendor|contratado|seller|supplier)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?=\\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$)",
    "(?i)(?:prestador|provider|contractor)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?=\\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$)"
  ).map(pyre)
  private val TableLineP = pyre("(?m)^\\|.*\\|$")
  // Python's broken `^#{1,2,3}\s+(.+)$` == literal "#{1,2,3}" prefix:
  private val BrokenHeaderP = pyre("^#\\{1,2,3\\}\\s+(.+)$")
  private val BoldSectionP = pyre("\\*\\*([^*]+):\\*\\*([^*\\n]*)")
  private val AmountStripP = pyre("[R$US$USD€£\\s]")
  private val YearP = pyre("\\b(19|20)\\d{2}\\b")
  private val EntityAmountKeepP = pyre("[^Vdt .,]+")

  /** services/contract_parser.py:41-48 — order matters for key_clauses. */
  val SectionHeaders: Seq[String] = Seq(
    "vigência", "duração", "termo", "prazo", "expiração",
    "rescisão", "terminação", "cancelamento",
    "confidencialidade", "sigilo", "não divulgação",
    "pagamentos", "pagamento", "valor", "preço", "compensação",
    "obrigações", "responsabilidades", "deveres",
    "foro", "jurisdição", "lei aplicável", "disputas")

  private def firstMatch(p: Pattern, s: String): Option[String] = {
    val m = p.matcher(s)
    if (m.find()) Option(m.group(1)) else None
  }
  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** P1 — first `#`/`##` heading (contract_parser.py:115-117). */
  def title(content: String): Option[String] =
    firstMatch(TitleP, content).map(_.trim)

  /** P2 (plain) — the JSON/block path uses only this pattern (:209-213). */
  def contractNumberPlain(content: String): Option[String] =
    firstMatch(ContractNumP, content).map(_.trim)

  /** P2 — contract number with bold-markdown fallback (:119-130). */
  def contractNumber(content: String): Option[String] =
    contractNumberPlain(content)
      .orElse(firstMatch(BoldContractNumP, content).map(_.trim))

  /** P3 — first currency token (:133-135). */
  def currency(content: String): Option[String] = firstMatch(CurrencyP, content)

  /** P4 — amount parse with the reference's exact char-strip + locale
    * normalization quirks (:467-483). Delegates to the single
    * AmountParser implementation (char strip, locale swap, Python-float
    * literal validation) shared with the native Catalyst expression. */
  def parseAmount(amountStr: String): Option[Double] =
    Option(graft.functions.AmountParser.parseBoxed(amountStr)).map(_.doubleValue)

  /** Markdown metadata amount flow (:133-148): amount only sought when a
    * currency matched; bold total-value fallback when absent/unparseable. */
  def totalValue(content: String): Option[Double] = {
    val fromLabel =
      if (currency(content).isDefined)
        firstMatch(AmountP, content).flatMap(parseAmount)
      else None
    // Python truthiness: a parsed 0.0 still triggers the bold fallback.
    fromLabel.filter(_ != 0.0)
      .orElse(firstMatch(BoldAmountP, content).flatMap(parseAmount))
  }

  /** P5 — multi-pattern date extraction (:377-415). Only the DD/MM/YYYY and
    * YYYY-MM-DD patterns are live (see class Scaladoc); invalid calendar
    * dates are skipped; result stable-sorted by match position. */
  def extractDates(content: String): Seq[DateHit] = {
    val out = mutable.ArrayBuffer.empty[DateHit]
    def valid(y: Int, mo: Int, d: Int): Option[String] =
      try { val ld = java.time.LocalDate.of(y, mo, d); Some(ld.toString) }
      catch { case _: java.time.DateTimeException => None }
    val m1 = DateDmyP.matcher(content)
    while (m1.find()) {
      valid(m1.group(3).toInt, m1.group(2).toInt, m1.group(1).toInt)
        .foreach(d => out += DateHit(d, m1.group(0), m1.start()))
    }
    val m2 = DateYmdP.matcher(content)
    while (m2.find()) {
      valid(m2.group(1).toInt, m2.group(2).toInt, m2.group(3).toInt)
        .foreach(d => out += DateHit(d, m2.group(0), m2.start()))
    }
    out.sortBy(_.position).toSeq   // stable, like Python list.sort
  }

  /** Markdown date flow with bold fallbacks (:150-169): bold dates only
    * consulted when the generic extraction found nothing; expiration only
    * appended when the effective fallback succeeded. */
  def datesMarkdown(content: String): Seq[DateHit] = {
    val generic = extractDates(content)
    if (generic.nonEmpty) generic
    else {
      val eff = {
        val m = BoldEffectiveP.matcher(content)
        if (m.find()) extractDates(m.group(0)) else Seq.empty
      }
      if (eff.nonEmpty) {
        val exp = {
          val m = BoldExpirationP.matcher(content)
          if (m.find()) extractDates(m.group(0)) else Seq.empty
        }
        eff ++ exp
      } else eff
    }
  }

  // Keyword prefilters: each party pattern starts with a literal-keyword
  // alternation, so a string not containing any keyword (case-folded)
  // cannot match — a contains() scan is ~10x cheaper than the regex and
  // preserves semantics exactly. 'cliente' is covered by 'client'.
  private val ClientKw1 = Array("client", "contratante", "buyer")
  private val ClientKw2 = Array("empresa", "company", "corporation")
  private val VendorKw1 = Array("fornecedor", "vendor", "contratado", "seller", "supplier")
  private val VendorKw2 = Array("prestador", "provider", "contractor")
  private def containsAny(lc: String, kws: Array[String]): Boolean = {
    var i = 0
    while (i < kws.length) { if (lc.contains(kws(i))) return true; i += 1 }
    false
  }

  /** P6 — party extraction, first-match-wins over ordered patterns
    * (:417-446). Returns (client, vendor). */
  def parties(content: String): (Option[String], Option[String]) =
    partiesLc(content, lower(content))

  /** P6 with a caller-supplied lowercase view (hot path: BlockMeta runs
    * this per paragraph). */
  def partiesLc(content: String, lc: String): (Option[String], Option[String]) = {
    val c = (if (containsAny(lc, ClientKw1)) firstMatch(ClientPs(0), content) else None)
      .orElse(if (containsAny(lc, ClientKw2)) firstMatch(ClientPs(1), content) else None)
      .map(_.trim)
    val v = (if (containsAny(lc, VendorKw1)) firstMatch(VendorPs(0), content) else None)
      .orElse(if (containsAny(lc, VendorKw2)) firstMatch(VendorPs(1), content) else None)
      .map(_.trim)
    (c, v)
  }

  /** Prefilter twins for the other per-paragraph extractors (see P6 note):
    * the number pattern needs 'ref'/'contract'/'número', the currency
    * pattern one of its literal tokens, the date patterns a digit. */
  def mayHaveNumber(lc: String): Boolean =
    lc.contains("ref") || lc.contains("contract") || lc.contains("número")
  def mayHaveCurrency(lc: String): Boolean =
    lc.contains("$") || lc.contains("usd") || lc.contains("brl") ||
      lc.contains("eur") || lc.contains("€") || lc.contains("£")
  def mayHaveDate(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= '0' && s.charAt(i) <= '9') return true; i += 1 }
    false
  }

  /** Markdown party flow with bold fallbacks (:171-187). */
  def partiesMarkdown(content: String): (Option[String], Option[String]) = {
    val (c0, v0) = parties(content)
    val c = c0.orElse(firstMatch(BoldClientP, content).map(_.trim))
    val v = v0.orElse(firstMatch(BoldVendorP, content).map(_.trim))
    (c, v)
  }

  /** P7 — keyword containment type detection, priority order as written
    * (:448-465). NOTE the reference quirks: bare substrings like "cr" match
    * inside any word — reproduced. */
  def contractType(content: String): Option[String] =
    contractTypeLc(lower(content))

  /** P7 on an already-lowercased view (hot path avoids a content copy). */
  def contractTypeLc(c: String): Option[String] = {
    def any(ts: String*) = ts.exists(c.contains)
    if (any("master service agreement", "msa", "acordo quadro")) Some("MSA")
    else if (any("local service agreement", "lsa", "acordo local")) Some("LSA")
    else if (any("statement of work", "sow", "escopo de trabalho")) Some("SOW")
    else if (any("project work order", "pwo", "ordem de serviço")) Some("PWO")
    else if (any("change request", "cr", "solicitação de mudança")) Some("CR")
    else if (any("change notification form", "cnf", "formulário de notificação")) Some("CNF")
    else None
  }

  /** P8 — emails, deduped; sorted for determinism (:312-315). */
  def emails(content: String): Seq[String] = {
    val m = EmailP.matcher(content)
    val out = mutable.LinkedHashSet.empty[String]
    while (m.find()) out += m.group(0)
    out.toSeq.sorted
  }

  /** P9 — CNPJ/CPF, deduped + sorted (:317-320). */
  def cnpjCpf(content: String): Seq[String] = {
    val m = CnpjCpfP.matcher(content)
    val out = mutable.LinkedHashSet.empty[String]
    while (m.find()) out += m.group(0)
    out.toSeq.sorted
  }

  /** P10 — markdown table detection (:322-328). Returns (count, hasHeaders). */
  def tables(content: String): (Int, Boolean) = {
    val m = TableLineP.matcher(content)
    var n = 0; var hdr = false
    while (m.find()) { n += 1; if (m.group(0).contains("---")) hdr = true }
    (n, hdr)
  }

  /** P11 — key-clause flags: ordered list of section headers present as
    * substrings of the lowercased content (:330-337). */
  def keyClauses(content: String): Seq[String] =
    keyClausesLc(lower(content))

  /** P11 on an already-lowercased view. */
  def keyClausesLc(c: String): Seq[String] =
    SectionHeaders.filter(h => c.contains(h))

  /** Sections from markdown (:241-280): broken-header scan (literal
    * `#{1,2,3}`), then bold-pattern fallback. Last-wins per key, insertion
    * order preserved (Python dict semantics). */
  def sectionsMarkdown(content: String): Seq[(String, String)] = {
    val sections = mutable.LinkedHashMap.empty[String, String]
    var current: Option[String] = None
    val buf = mutable.ArrayBuffer.empty[String]
    for (line <- content.split("\n", -1)) {
      val m = BrokenHeaderP.matcher(line)
      if (m.matches() || m.lookingAt()) {
        if (current.isDefined && buf.nonEmpty)
          sections(current.get) = buf.mkString("\n").trim
        current = Some(lower(m.group(1)))
        buf.clear()
      } else if (current.isDefined) buf += line
    }
    if (current.isDefined && buf.nonEmpty)
      sections(current.get) = buf.mkString("\n").trim
    if (sections.isEmpty) {
      val m = BoldSectionP.matcher(content)
      while (m.find()) {
        val name = lower(m.group(1)); val body = m.group(2).trim
        if (body.nonEmpty) sections(name) = body
      }
    }
    sections.toSeq
  }

  /** Sections from ordered blocks (:282-306): heading opens a section,
    * paragraphs accumulate; empty accumulations are dropped. */
  def sectionsFromBlocks(blocks: Seq[Span]): Seq[(String, String)] = {
    val sections = mutable.LinkedHashMap.empty[String, String]
    var current: Option[String] = None
    val buf = mutable.ArrayBuffer.empty[String]
    for (b <- blocks) {
      if (b.kind == "heading") {
        if (current.isDefined && buf.nonEmpty)
          sections(current.get) = buf.mkString("\n").trim
        current = Some(lower(Option(b.text).getOrElse("")))
        buf.clear()
      } else if (b.kind == "paragraph" && current.isDefined)
        buf += Option(b.text).getOrElse("")
    }
    if (current.isDefined && buf.nonEmpty)
      sections(current.get) = buf.mkString("\n").trim
    sections.toSeq
  }

  /** P23 — extraction confidence (:544-577). `datesNonEmpty` etc. mirror the
    * metadata-dict truthiness checks. */
  def confidence(hasTitle: Boolean, hasNumber: Boolean, hasBothParties: Boolean,
                 hasDates: Boolean, nSections: Int, nClauses: Int): Double = {
    var score = 0.0
    if (hasTitle) score += 1.0
    if (hasNumber) score += 1.0
    if (hasBothParties) score += 1.0
    if (hasDates) score += 1.0
    if (nSections > 0) score += math.min(nSections / 5.0, 1.0)
    if (nClauses > 0) score += math.min(nClauses / 3.0, 1.0)
    score / 6.0
  }

  /** P15 — ≤512-char chunking preferring sentence boundaries
    * (processing/entity_extractor.py:346-362). */
  def chunkText(text: String, maxLength: Int = 512): Seq[(Int, String)] = {
    val chunks = mutable.ArrayBuffer.empty[(Int, String)]
    var start = 0
    while (start < text.length) {
      var end = start + maxLength
      if (end < text.length) {
        val lastPeriod = text.lastIndexOf('.', end - 1)  // == rfind('.', start, end)
        if (lastPeriod > start) end = lastPeriod + 1
      }
      val e = math.min(end, text.length)
      chunks += ((start, text.substring(start, e)))
      start = e
    }
    chunks.toSeq
  }

  /** P16 — sentence segmentation + heuristic class (:364-384). */
  def segments(text: String): Seq[(String, String)] = {
    text.split("\\.", -1).toSeq.map(_.trim).filter(_.length >= 10).flatMap { s =>
      val l = lower(s)
      if (Seq("$", "€", "£", "amount", "value", "cost").exists(l.contains))
        Some((s, "amount"))
      else if (Seq("date", "effective", "expiration", "valid").exists(l.contains))
        Some((s, "date"))
      else if (Seq("contract", "agreement", "sow", "msa").exists(l.contains))
        Some((s, "identifier"))
      else None
    }
  }

  private val DateTypes = Set("START_DATE", "END_DATE", "SIGNATURE_DATE",
    "EFFECTIVE_DATE", "EXPIRATION_DATE")

  /** P17 — entity-text normalization (:386-407), including the reference's
    * digit-stripping AMOUNT mangle. Date normalization mirrors
    * dateutil.parse on COMPLETE dates (goldens captured from the live
    * library): month-first numeric with the day-first fallback when the
    * first number exceeds 12, 2-digit years on a ±50 window, yyyy/M/d,
    * month-name forms. Incomplete dates ('march 2024', '2024') are
    * intentionally NOT normalized: dateutil fills the missing fields from
    * the WALL CLOCK — non-deterministic in the reference itself, excluded
    * per SURVEY §7.4.5. */
  def normalizeEntity(entityType: String, rawText: String): String = {
    val text = lower(rawText).trim
    if (DateTypes.contains(entityType)) {
      parseDateLoose(text).getOrElse(text)
    } else if (entityType == "AMOUNT") {
      var t = EntityAmountKeepP.matcher(text).replaceAll("")
      t = t.replace(".", "").replace(",", ".")
      try java.lang.Double.parseDouble(t).toString
      catch { case _: NumberFormatException => t }
    } else text
  }

  private val MonthMap: Map[String, Int] = {
    val full = IndexedSeq("january", "february", "march", "april", "may",
      "june", "july", "august", "september", "october", "november", "december")
    (full.zipWithIndex.map { case (n, i) => n -> (i + 1) } ++
      full.zipWithIndex.map { case (n, i) => n.take(3) -> (i + 1) }).toMap
  }
  // dateutil-shaped complete-date forms (input is already lowercased)
  private val NumYmdP2 = pyre("(\\d{4})[/-](\\d{1,2})[/-](\\d{1,2})")
  private val NumMdy4P = pyre("(\\d{1,2})[/-](\\d{1,2})[/-](\\d{4})")
  private val NumMdy2P = pyre("(\\d{1,2})[/-](\\d{1,2})[/-](\\d{2})")
  private val NameMdyP = pyre("([a-z]+)\\.?\\s+(\\d{1,2})(?:st|nd|rd|th)?,?\\s+(\\d{4})")
  private val NameDmyP = pyre("(\\d{1,2})(?:st|nd|rd|th)?\\s+(?:of\\s+)?([a-z]+)\\.?,?\\s+(\\d{4})")

  private def validDate(y: Int, m: Int, d: Int): Option[String] =
    try Some(java.time.LocalDate.of(y, m, d).toString)
    catch { case _: java.time.DateTimeException => None }

  /** dateutil numeric resolution: month-first, day-first fallback only
    * when the month slot is impossible ('15/01/2024' -> 2024-01-15,
    * '31/04/2024' -> fail like the library). */
  private def monthFirst(y: Int, a: Int, b: Int): Option[String] =
    if (a <= 12) validDate(y, a, b) else validDate(y, b, a)

  /** dateutil 2-digit year: current century, folded into the ±50 window
    * around the anchor year. The library anchors on the WALL CLOCK; we pin
    * the anchor (2026, capture date of the goldens) for determinism. */
  private def expandYear(yy: Int): Int = {
    val anchor = 2026
    val y = yy + 2000
    if (math.abs(y - anchor) < 50) y
    else if (y < anchor) y + 100 else y - 100
  }

  private def parseDateLoose(s: String): Option[String] = {
    val iso = DateYmdP.matcher(s)
    if (iso.matches())
      return validDate(iso.group(1).toInt, iso.group(2).toInt, iso.group(3).toInt)
    val ymd = NumYmdP2.matcher(s)
    if (ymd.matches())
      return validDate(ymd.group(1).toInt, ymd.group(2).toInt, ymd.group(3).toInt)
    val mdy = NumMdy4P.matcher(s)
    if (mdy.matches())
      return monthFirst(mdy.group(3).toInt, mdy.group(1).toInt, mdy.group(2).toInt)
    val mdy2 = NumMdy2P.matcher(s)
    if (mdy2.matches())
      return monthFirst(expandYear(mdy2.group(3).toInt),
        mdy2.group(1).toInt, mdy2.group(2).toInt)
    val nmd = NameMdyP.matcher(s)
    if (nmd.matches())
      return MonthMap.get(nmd.group(1))
        .flatMap(m => validDate(nmd.group(3).toInt, m, nmd.group(2).toInt))
    val ndm = NameDmyP.matcher(s)
    if (ndm.matches())
      return MonthMap.get(ndm.group(2))
        .flatMap(m => validDate(ndm.group(3).toInt, m, ndm.group(1).toInt))
    None
  }

  /** A1 — dedup-merge: stable sort by confidence desc, keep first per
    * (normalized_text, entity_type) (:409-434). */
  def dedupEntities(entities: Seq[Entity]): Seq[Entity] = {
    val sorted = entities.sortBy(e => -e.confidence)   // stable
    val seen = mutable.HashSet.empty[(String, String)]
    sorted.filter { e =>
      seen.add((normalizeEntity(e.entity_type, e.text), e.entity_type))
    }
  }

  /** P18 — year extraction (scripts/system_contract_organizer.py:209-220). */
  def extractYear(dateString: String): String = {
    if (dateString == null || dateString.isEmpty) return ""
    val m = YearP.matcher(dateString)
    if (m.find()) m.group(0) else ""
  }

  /** P19 — supplier normalize (:222-235). */
  def normalizeSupplier(supplier: String): String = {
    if (supplier == null || supplier.isEmpty) return "Unknown"
    val repl = supplier.replace(' ', '_').replace('-', '_')
    val kept = repl.filter(c => Character.isLetterOrDigit(c) || c == '_')
    if (kept.length > 50) kept.substring(0, 50) else kept
  }

  /** P20 — canonical filename (:237-263). */
  def canonicalFilename(supplier: String, contractType: String,
                        startYear: String, endYear: String, contractId: String): String = {
    val sup = normalizeSupplier(supplier)
    val typ = if (contractType == null || contractType.isEmpty) "UNKNOWN"
              else contractType.toUpperCase(Locale.ROOT)
    val years = if (startYear == endYear) startYear else s"${startYear}_$endYear"
    var id = Option(contractId).getOrElse("")
      .replace(" ", "_").replace("/", "_").replace("-", "_")
    if (id.isEmpty || id == "null") id = "UNKNOWN_ID"
    val fn = s"${sup}_${typ}_${years}_$id.pdf"
    fn.filter(c => Character.isLetterOrDigit(c) || "._-".contains(c))
  }

  /** P21 — rename-vs-translate decision (:265-277). */
  def operationType(originalFilename: String): String = {
    if (!isAsciiSafe(originalFilename)) "translate"
    else "rename"   // both branches of the ASCII path return "rename"
  }

  /** P12 — ASCII-safe filename predicate (services/file_handler.py:578-592). */
  def isAsciiSafe(filename: String): Boolean =
    filename != null && filename.forall(_ < 128)

  // ---- P13/P14 filename sanitize via deterministic fallback term map ----

  /** services/file_handler.py:301-323 — first delimiter that occurs wins. */
  def splitFilenameParts(filename: String): Seq[String] = {
    val delimiters = Seq("_", "-", " ", "　", "、", "。", "（", "）")
    delimiters.find(filename.contains).map { d =>
      val parts = filename.split(Pattern.quote(d), -1).toSeq
        .map(_.trim).filter(p => p.nonEmpty && p.length > 1)
      if (parts.nonEmpty) parts else Seq(filename)
    }.getOrElse(Seq(filename))
  }

  /** services/file_handler.py:346-389 — deterministic CJK→EN term map.
    * Iteration order matters (longer keys listed first in the reference). */
  val TermMap: Seq[(String, String)] = Seq(
    "【" -> "", "】" -> "",
    "御見積書" -> "Quotation",
    "見積書" -> "Quotation",
    "見積" -> "Estimate",
    "請求書" -> "Invoice",
    "契約" -> "Contract",
    "契約書" -> "Contract",
    "システム" -> "System",
    "運用" -> "Operations",
    "サポート" -> "Support",
    "合同" -> "Contract",
    "报价" -> "Quotation",
    "系统" -> "System",
    "支持" -> "Support")

  def fallbackMapFilename(baseName: String): String = {
    val parts = splitFilenameParts(baseName)
    val mapped = parts.map { part0 =>
      var part = part0
      for ((k, v) <- TermMap) if (part.contains(k)) part = part.replace(k, v)
      if (part.nonEmpty) part else part0
    }
    if (mapped.isEmpty) baseName else mapped.mkString("_")
  }

  /** services/file_handler.py:325-344 — cleanup of translated text. */
  def cleanTranslatedText(text: String): String = {
    var t = text.replaceAll("[\"'`]", "")
    t = t.replaceAll("[^\\w\\s\\-]", "_")
    t = t.replaceAll("\\s+", "_")
    t.replaceAll("^_+|_+$", "")
  }

  /** Full deterministic sanitize path (no translation provider):
    * file_handler.py:290-299. Returns (sanitizedFilename, status). */
  def sanitizeFilename(filename: String): (String, String) = {
    if (isAsciiSafe(filename)) (filename, "ok")
    else {
      val dot = filename.lastIndexOf('.')
      val (base, ext) = if (dot >= 0) (filename.substring(0, dot), filename.substring(dot))
                        else (filename, "")
      val mapped = fallbackMapFilename(base)
      if (mapped.nonEmpty && mapped != base)
        (cleanTranslatedText(mapped) + ext, "failed_fallback_applied")
      else (filename, "failed")
    }
  }

  // ---- P22 table-cell text cleanup (services/table_processor_fixed.py) ----
  private val DotLeaderP1 = pyre("(\\s\\.){2,}")
  private val DotLeaderP2 = pyre("\\.{2,}")

  /** Finalize one cell line (:394-415): drop "."/empty, strip dot leaders,
    * normalize the 4 listed unicode spaces (:417-435). ftfy.fix_text is
    * reduced to identity — only the listed code points are load-bearing. */
  def cleanCellLine(line: String): Option[String] = {
    val t0 = line.trim
    if (t0.isEmpty || t0 == ".") return None
    var t = DotLeaderP1.matcher(t0).replaceAll("")
    t = DotLeaderP2.matcher(t).replaceAll("")
    t = normalizeSpaces(t)
    Some(t)
  }

  def normalizeSpaces(text: String): String =
    text.replace('\u2003', ' ').replace('\u2002', ' ')
      .replace('\u00a0', ' ').replace("\u200b", " ")

  /** P25 — lineage op hash (scripts/system_contract_organizer.py:359-362). */
  def opHash(ts: String, operation: String, originalPath: String, newPath: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = md.digest(s"$ts$operation$originalPath$newPath".getBytes("UTF-8"))
    bytes.map("%02x".format(_)).mkString
  }

  // ---- P26 boilerplate strip (north-rule addition; Boilerpipe-style) ----
  private val LinkP = Pattern.compile("(?i)<a\\b[^>]*>(.*?)</a>")
  private val TagP = Pattern.compile("<[^>]+>")

  /** Text density = plain-text chars / total chars; link density = chars
    * inside <a> tags / plain-text chars. A span is content when
    * textDensity >= tauText && linkDensity <= tauLink. */
  def htmlDensities(html: String): (Double, Double) = {
    if (html == null || html.isEmpty) return (0.0, 0.0)
    val linkM = LinkP.matcher(html)
    var linkChars = 0
    while (linkM.find()) {
      linkChars += TagP.matcher(linkM.group(1)).replaceAll("").length
    }
    val text = TagP.matcher(html).replaceAll("")
    val textDensity = if (html.isEmpty) 0.0 else text.length.toDouble / html.length
    val linkDensity = if (text.isEmpty) 1.0 else linkChars.toDouble / text.length
    (textDensity, linkDensity)
  }

  def isContentHtml(html: String, tauText: Double = 0.35, tauLink: Double = 0.33): Boolean = {
    val (td, ld) = htmlDensities(html)
    td >= tauText && ld <= tauLink
  }
}
