package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Rules
import graft.model.{Entity, Span}

/** Golden tests for the scalar extraction rules. Every expected value was
  * produced by RUNNING the live reference parser
  * (services/contract_parser.py, processing/entity_extractor.py,
  * services/file_handler.py, scripts/system_contract_organizer.py) on the
  * reference's own fixtures — including its quirks (broken section-header
  * quantifier, dead month-date pattern, currency-prefixed amounts never
  * parsing, digit-stripping AMOUNT normalization). */
class RulesSpec extends AnyFunSuite {

  /** tests/parser/test_contract_parser.py:26-54 verbatim. */
  val sampleMarkdown: String = """# Master Service Agreement

## Contract Information
**Contract Number:** MSA-2024-001
**Client:** TechCorp Inc.
**Vendor:** DevSolutions Ltd.

## Financial Terms
**Total Value:** R$ 150.000,00
**Currency:** BRL

## Dates
**Effective Date:** 01/01/2024
**Expiration Date:** 31/12/2025

## Key Clauses
### Vigência
This agreement is valid for 2 years.

### Pagamentos
Monthly payments of R$ 6.250,00.

### Confidencialidade
All information shared is confidential.

## Contact Information
**Email:** contracts@techcorp.com
**CNPJ:** 12.345.678/0001-90
"""

  test("P1 title: first H1/H2 heading") {
    assert(Rules.title(sampleMarkdown).contains("Master Service Agreement"))
    assert(Rules.title("no heading here").isEmpty)
    assert(Rules.title("### h3 only\n## H2 Title").contains("H2 Title"))
  }

  test("P2 contract number incl. reference quirks") {
    assert(Rules.contractNumber(sampleMarkdown).contains("MSA-2024-001"))
    // quirk: 'ref' matches inside words, case-insensitive group
    assert(Rules.contractNumberPlain("see reference ABC-1").contains("erence"))
    assert(Rules.contractNumberPlain("prefers X").contains("ers"))
    assert(Rules.contractNumberPlain("Ref: 12/34").contains("12/34"))
    assert(Rules.contractNumberPlain("nothing numeric !").isEmpty)
  }

  test("P3 currency: first token wins") {
    assert(Rules.currency(sampleMarkdown).contains("R$"))
    assert(Rules.currency("pay 100 EUR or USD").contains("EUR"))
    assert(Rules.currency("price in £").contains("£"))
    assert(Rules.currency("no money").isEmpty)
  }

  test("P4 amount parse: all reference edge cases") {
    assert(Rules.parseAmount("R$ 150.000,00").contains(150000.0))
    assert(Rules.parseAmount("US$ 50,000.00").contains(50.0)) // pinned quirk
    assert(Rules.parseAmount("€ 25.000,00").contains(25000.0))
    assert(Rules.parseAmount("150.000,00").contains(150000.0))
    assert(Rules.parseAmount("25,5").contains(25.5))
    assert(Rules.parseAmount("invalid").isEmpty)
    assert(Rules.parseAmount("").isEmpty)
  }

  test("P4 markdown flow: currency-prefixed amounts never parse (e2e quirk)") {
    // tests/test_e2e_workflow.py:92-97 tolerates the miss; the live
    // reference extracts NO total_value from the canonical fixture.
    assert(Rules.totalValue(sampleMarkdown).isEmpty)
    // plain amounts stop at the comma: group '150.000' -> 150.0
    assert(Rules.totalValue("Currency: USD\nTotal: 150.000,00").contains(150.0))
  }

  test("P5 dates: two live patterns, dead month pattern, position sort") {
    val d1 = Rules.extractDates("01/01/2024")
    assert(d1.map(d => (d.date, d.text, d.position)) == Seq(("2024-01-01", "01/01/2024", 0)))
    assert(Rules.extractDates("2024-12-31").head.date == "2024-12-31")
    assert(Rules.extractDates("15 de março 2024").isEmpty) // dead pattern
    assert(Rules.extractDates("15 de mar 2024").isEmpty)   // dead pattern
    assert(Rules.extractDates("32/01/2024").isEmpty)       // invalid day skipped... 3 2/01/2024?
    val both = Rules.extractDates("from 2024-01-02 then 03/04/2025")
    assert(both.map(_.date) == Seq("2024-01-02", "2025-04-03"))
    val md = Rules.datesMarkdown(sampleMarkdown)
    assert(md.size == 2 && md.head.date == "2024-01-01" && md(1).date == "2025-12-31")
  }

  test("P6 parties incl. greedy-class quirks") {
    val (c1, v1) = Rules.parties("Client: TechCorp Inc. Vendor: DevSolutions Ltd.")
    assert(c1.contains("TechCorp Inc.") && v1.contains("DevSolutions Ltd."))
    val (c2, v2) = Rules.parties("Contratante: Empresa Brasil S.A. Contratado: Fornecedor XYZ")
    assert(c2.contains("Empresa Brasil S.A.") && v2.contains("Fornecedor XYZ"))
    val (c3, v3) = Rules.parties("The client ACME Corp hired supplier Beta Ltd")
    assert(c3.contains("ACME Corp hired") && v3.contains("Beta Ltd"))
    val (c4, v4) = Rules.partiesMarkdown(sampleMarkdown)
    assert(c4.contains("TechCorp Inc.") && v4.contains("DevSolutions Ltd."))
  }

  test("P7 type detection: priority order + substring quirks") {
    assert(Rules.contractType("Master Service Agreement").contains("MSA"))
    assert(Rules.contractType("statement of work details").contains("SOW"))
    assert(Rules.contractType("this has a change request").contains("CR"))
    assert(Rules.contractType("ordem de serviço 123").contains("PWO"))
    assert(Rules.contractType("local service agreement").contains("LSA"))
    assert(Rules.contractType("nothing here").isEmpty)
    assert(Rules.contractType("across the street").contains("CR")) // 'cr' quirk
    assert(Rules.contractType("the balsa wood").contains("LSA"))   // 'lsa' quirk
  }

  test("P8/P9 emails + cnpj: dedup + deterministic sort") {
    assert(Rules.emails(sampleMarkdown) == Seq("contracts@techcorp.com"))
    assert(Rules.emails("a@b.com x a@b.com y z@a.io") == Seq("a@b.com", "z@a.io"))
    assert(Rules.cnpjCpf(sampleMarkdown) == Seq("12.345.678/0001-90"))
    assert(Rules.cnpjCpf("cpf 123.456.789-09 twice 123.456.789-09") == Seq("123.456.789-09"))
  }

  test("P10 tables: row count + header detection") {
    assert(Rules.tables(sampleMarkdown) == ((0, false)))
    val t = "| a | b |\n|---|---|\n| 1 | 2 |"
    assert(Rules.tables(t) == ((3, true)))
  }

  test("P11 key clauses: ordered substring flags incl. 'pagamento' overlap") {
    assert(Rules.keyClauses(sampleMarkdown) ==
      Seq("vigência", "confidencialidade", "pagamentos", "pagamento"))
  }

  test("sections markdown: broken header regex -> bold fallback (live-reference golden)") {
    val s = Rules.sectionsMarkdown(sampleMarkdown).toMap
    assert(s.size == 9)
    assert(s("contract number") == "MSA-2024-001")
    assert(s("client") == "TechCorp Inc.")
    assert(s("total value") == "R$ 150.000,00")
    assert(s("cnpj") == "12.345.678/0001-90")
    // real markdown headers never open sections (Python's broken {1,2,3})
    assert(Rules.sectionsMarkdown("## Real Header\ncontent line").isEmpty)
    // ...but the literal text does
    assert(Rules.sectionsMarkdown("#{1,2,3} Weird\ncontent").toMap == Map("weird" -> "content"))
  }

  test("sections from blocks: heading accumulation (live-reference golden)") {
    val blocks = Seq(
      Span("heading", "Master Service Agreement", "", 0),
      Span("paragraph", "Contract Number: MSA-2024-001", "", 1),
      Span("paragraph", "Client: TechCorp Inc.", "", 2),
      Span("heading", "Key Clauses", "", 3),
      Span("paragraph", "Vigência: ok.", "", 4))
    val s = Rules.sectionsFromBlocks(blocks)
    assert(s.map(_._1) == Seq("master service agreement", "key clauses"))
    assert(s.head._2 == "Contract Number: MSA-2024-001\nClient: TechCorp Inc.")
    // heading with no following paragraphs is dropped
    assert(Rules.sectionsFromBlocks(Seq(Span("heading", "X", "", 0))).isEmpty)
  }

  test("P23 confidence formula") {
    assert(Rules.confidence(true, true, true, true, 9, 4) == 1.0)
    assert(math.abs(Rules.confidence(true, true, true, true, 2, 4) - 0.9) < 1e-9)
    assert(Rules.confidence(false, false, false, false, 0, 0) == 0.0)
  }

  test("P15 chunking: sentence-boundary preference") {
    val text = ("x" * 500) + ". tail " + ("y" * 100)
    val chunks = Rules.chunkText(text, 512)
    assert(chunks.head._2.endsWith("."))
    assert(chunks.map(_._2).mkString == text) // lossless
    assert(chunks.forall(_._2.length <= 512))
    val noDot = "z" * 1100
    assert(Rules.chunkText(noDot, 512).map(_._2.length) == Seq(512, 512, 76))
  }

  test("P15 fixed-width twin: chunkText on period-free text IS the p15_chunks_fixed shape") {
    // the oracle query p15_chunks_fixed gates fixed-width (sequence+substr)
    // chunking; on text with no '.', the sentence-boundary fold degenerates
    // to exactly that shape — tying the Scala generator to the SQL twin
    val text = (1 to 300).map(i => "w" + i).mkString(" ")
    assert(!text.contains("."))
    val scala = Rules.chunkText(text, 128)
    val fixed = (0 until math.ceil(text.length / 128.0).toInt)
      .map(i => (i * 128, text.substring(i * 128, math.min((i + 1) * 128, text.length))))
    assert(scala == fixed)
  }

  test("P16 segmentation: heuristic classes") {
    val segs = Rules.segments(
      "The total cost is high. Effective date applies here. This agreement binds. tiny.")
    assert(segs == Seq(
      ("The total cost is high", "amount"),
      ("Effective date applies here", "date"),
      ("This agreement binds", "identifier")))
  }

  test("P17 normalize entity: digit-stripping AMOUNT mangle (live golden)") {
    assert(Rules.normalizeEntity("AMOUNT", "150.000,00") == ".")   // digits stripped!
    assert(Rules.normalizeEntity("AMOUNT", "r$ 150.000,00") == " .")
    assert(Rules.normalizeEntity("START_DATE", "2024-01-01") == "2024-01-01")
    assert(Rules.normalizeEntity("START_DATE", "01/02/2024") == "2024-01-02") // US month-first
    assert(Rules.normalizeEntity("SUPPLIER", "  ACME Corp  ") == "acme corp")
  }

  test("A1 entity dedup: stable confidence-desc keep-first") {
    val es = Seq(
      Entity("ACME Corp", "SUPPLIER", 0, 9, 0.7),
      Entity("acme corp", "SUPPLIER", 20, 29, 0.9),
      Entity("Beta", "CUSTOMER", 5, 9, 0.5))
    val out = Rules.dedupEntities(es)
    assert(out.size == 2)
    assert(out.head.confidence == 0.9 && out.head.text == "acme corp")
  }

  test("P18-P21 organizer scalar ops") {
    assert(Rules.extractYear("effective 15/03/2023 onwards") == "2023")
    assert(Rules.extractYear("no year") == "")
    assert(Rules.extractYear("") == "")
    assert(Rules.normalizeSupplier("Ernst & Young LLP") == "Ernst__Young_LLP")
    assert(Rules.normalizeSupplier("") == "Unknown")
    assert(Rules.normalizeSupplier("a" * 60).length == 50)
    assert(Rules.canonicalFilename("Acme Co", "msa", "2023", "2023", "AB 1/2-3")
      == "Acme_Co_MSA_2023_AB_1_2_3.pdf")
    assert(Rules.canonicalFilename("Acme", "sow", "2023", "2025", "")
      == "Acme_SOW_2023_2025_UNKNOWN_ID.pdf")
    assert(Rules.operationType("框架合同.pdf") == "translate")
    assert(Rules.operationType("normal_file.pdf") == "rename")
  }

  test("P12-P14 sanitize: live-reference goldens") {
    assert(Rules.isAsciiSafe("normal_file.pdf"))
    assert(!Rules.isAsciiSafe("框架合同.pdf"))
    assert(Rules.fallbackMapFilename("【御見積書】_システム運用サポート")
      == "Quotation_SystemOperationsSupport")
    assert(Rules.fallbackMapFilename("框架合同") == "框架Contract")
    assert(Rules.splitFilenameParts("a_b-c d") == Seq("b-c d")) // len>1 filter quirk
    assert(Rules.splitFilenameParts("ab") == Seq("ab"))
    val (sanitized, status) = Rules.sanitizeFilename("【御見積書】_システム運用サポート.pdf")
    assert(sanitized == "Quotation_SystemOperationsSupport.pdf")
    assert(status == "failed_fallback_applied")
    assert(Rules.sanitizeFilename("ok.pdf") == (("ok.pdf", "ok")))
  }

  test("P22 cell cleanup: dot leaders + unicode spaces") {
    assert(Rules.cleanCellLine(" . ").isEmpty)
    assert(Rules.cleanCellLine("").isEmpty)
    assert(Rules.cleanCellLine("Intro . . . . 5").contains("Intro 5"))
    assert(Rules.cleanCellLine("Chapter.....9").contains("Chapter9"))
    assert(Rules.cleanCellLine("a b c").contains("a b c"))
  }

  test("P25 op hash: md5 of ts+op+paths") {
    val h = Rules.opHash("2025-08-19T16:53:51", "rename", "/a.pdf", "/b.pdf")
    assert(h.length == 32 && h.matches("[0-9a-f]+"))
    assert(h == Rules.opHash("2025-08-19T16:53:51", "rename", "/a.pdf", "/b.pdf"))
  }

  test("Unicode regex parity: accented input behaves like Python re (live-ref goldens)") {
    // Goldens captured by RUNNING the reference parser (contract_parser.py
    // patterns :27-37) on non-ASCII input — Python (?i) folds Unicode and
    // \b/\w are Unicode classes:
    //   'NÚMERO DO CONTRATO: ABC-123'      -> contract_number 'ABC-123'
    //   'contact José@mail.com now x@y.com' -> emails ['x@y.com'] (é is a
    //     word char: no \b before 's', and 'José' itself can't match)
    //   'contact maría.lopez@mail.com now'  -> ['.lopez@mail.com']
    assert(Rules.contractNumberPlain("NÚMERO DO CONTRATO: ABC-123") == Some("ABC-123"))
    assert(Rules.emails("contact José@mail.com now x@y.com") == Seq("x@y.com"))
    assert(Rules.emails("contact maría.lopez@mail.com now") == Seq(".lopez@mail.com"))
  }

  test("P17 date normalization: dateutil goldens on complete dates") {
    def n(s: String) = Rules.normalizeEntity("START_DATE", s)
    // captured from dateutil.parse(...).strftime('%Y-%m-%d')
    assert(n("15/01/2024") == "2024-01-15")   // day-first fallback (15 > 12)
    assert(n("01/05/2024") == "2024-01-05")   // month-first default
    assert(n("13-05-2024") == "2024-05-13")
    assert(n("January 5, 2024") == "2024-01-05")
    assert(n("jan. 5 2024") == "2024-01-05")
    assert(n("5 january 2024") == "2024-01-05")
    assert(n("5th of january 2024") == "2024-01-05")
    assert(n("2024/01/05") == "2024-01-05")
    assert(n("01/05/24") == "2024-01-05")     // 2-digit year, +/-50 window
    assert(n("01/05/99") == "1999-01-05")
    assert(n("31/04/2024") == "31/04/2024")   // invalid like the library
    assert(n("29/02/2023") == "29/02/2023")
    assert(n("29/02/2024") == "2024-02-29")
    // incomplete dates stay raw: dateutil fills them from the wall clock
    // (non-deterministic in the reference itself; documented restriction)
    assert(n("march 2024") == "march 2024")
    assert(n("2024") == "2024")
  }

  test("P26 boilerplate densities") {
    val nav = """<div class="nav"><a href="/h">Home</a> <a href="/c">Contracts</a> <a href="/a">About</a></div>"""
    val content = """<div class="main"><p>Execution terms for this contract follow the master schedule and annexes described in the document body at length.</p></div>"""
    assert(!Rules.isContentHtml(nav))
    assert(Rules.isContentHtml(content))
    val (tdNav, ldNav) = Rules.htmlDensities(nav)
    assert(ldNav >= 0.85)   // nearly all text inside links
    val (tdC, ldC) = Rules.htmlDensities(content)
    assert(ldC == 0.0 && tdC > 0.5)
  }
}
