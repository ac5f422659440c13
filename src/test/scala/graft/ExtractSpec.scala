package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Extract
import graft.model.Span

/** Whole-document goldens: both parse paths against outputs captured from
  * the LIVE reference parser on its own fixtures
  * (tests/parser/test_contract_parser.py:26-73, tests/test_e2e_workflow.py:
  * 40-104). */
class ExtractSpec extends AnyFunSuite {

  /** The JSON fixture (tests/parser/test_contract_parser.py:56-73) as spans. */
  val jsonBlocks: Seq[Span] = Seq(
    ("heading", "Master Service Agreement"),
    ("paragraph", "Contract Number: MSA-2024-001"),
    ("paragraph", "Client: TechCorp Inc."),
    ("paragraph", "Vendor: DevSolutions Ltd."),
    ("paragraph", "Total Value: R$ 150.000,00"),
    ("paragraph", "Currency: BRL"),
    ("paragraph", "Effective Date: 01/01/2024"),
    ("paragraph", "Expiration Date: 31/12/2025"),
    ("heading", "Key Clauses"),
    ("paragraph", "Vigência: This agreement is valid for 2 years."),
    ("paragraph", "Pagamentos: Monthly payments of R$ 6.250,00."),
    ("paragraph", "Confidencialidade: All information shared is confidential."),
    ("paragraph", "Email: contracts@techcorp.com"),
    ("paragraph", "CNPJ: 12.345.678/0001-90")
  ).zipWithIndex.map { case ((k, t), i) => Span(k, t, "", i) }

  test("parseBlocks matches the live reference JSON-path goldens") {
    val c = Extract.parseBlocks("doc-1", jsonBlocks)
    assert(c.title == "Master Service Agreement")
    assert(c.contract_number == "MSA-2024-001")
    assert(c.currency == "R$")
    assert(c.total_value.isEmpty)             // JSON path extracts no amount
    assert(c.effective_date == "2024-01-01")  // only the FIRST dated block
    assert(c.expiration_date == null)         // -> no expiration (quirk)
    assert(c.client_name == "TechCorp Inc.")
    assert(c.vendor_name == "DevSolutions Ltd.")
    assert(c.contract_type == "MSA")
    assert(c.emails == Seq("contracts@techcorp.com"))
    assert(c.cnpj_cpf == Seq("12.345.678/0001-90"))
    assert(c.key_clauses == Seq("vigência", "confidencialidade", "pagamentos", "pagamento"))
    assert(c.n_sections == 2)                 // msa + key clauses
    assert(math.abs(c.confidence - 0.9) < 1e-9)
  }

  test("parseBlocks is order-insensitive to span array order (sorts by offset)") {
    val shuffled = jsonBlocks.reverse
    assert(Extract.parseBlocks("d", shuffled) == Extract.parseBlocks("d", jsonBlocks))
  }

  /** tests/test_e2e_workflow.py:40-57 markdown fixture. */
  val e2eMarkdown: String = """# Master Service Agreement

## Contract Information
**Contract Number:** MSA-2024-001
**Client:** TechCorp Inc.
**Vendor:** DevSolutions Ltd.
**Total Value:** R$ 150.000,00
**Currency:** BRL
**Effective Date:** 01/01/2024
**Expiration Date:** 31/12/2025

## Contact Information
**Email:** contracts@techcorp.com
**CNPJ:** 12.345.678/0001-90

## Terms and Conditions
This agreement covers the provision of development services...
"""

  test("parseMarkdown matches the live reference markdown-path goldens") {
    val c = Extract.parseMarkdown("doc-2", e2eMarkdown)
    assert(c.title == "Master Service Agreement")
    assert(c.contract_number == "MSA-2024-001")
    assert(c.client_name == "TechCorp Inc.")
    assert(c.vendor_name == "DevSolutions Ltd.")
    assert(c.total_value.isEmpty)   // pinned: reference cannot parse 'R$ ...'
    assert(c.currency == "R$")
    assert(c.contract_type == "MSA")
    assert(c.effective_date == "2024-01-01")
    assert(c.expiration_date == "2025-12-31")
    assert(Extract.validate(c).isEmpty)   // e2e asserts 0 validation errors
  }

  test("markdown render round-trips through the markdown parser") {
    val md = Extract.markdownOf(jsonBlocks)
    assert(md.startsWith("# Master Service Agreement"))
    val c = Extract.parseMarkdown("doc-3", md)
    assert(c.title == "Master Service Agreement")
    assert(c.contract_number == "MSA-2024-001")
    // markdown path sees the whole text: both dates found
    assert(c.effective_date == "2024-01-01" && c.expiration_date == "2025-12-31")
  }

  test("boilerplate strip: nav/footer dropped, content html kept as paragraph") {
    val spans = Seq(
      Span("html", """<div><a href="/a">A</a> <a href="/b">B</a> <a href="/c">CLinks</a></div>""", "", 0),
      Span("heading", "Title Here", "", 1),
      Span("html", "<p>This is a long enough content paragraph about contract execution terms and schedules.</p>", "", 2),
      Span("media", "", "corpus://img/1.jpg", 3))
    val out = Extract.stripBoilerplate(spans)
    assert(out.map(_.kind) == Seq("heading", "paragraph", "media"))
    assert(out(1).text.contains("content paragraph"))
  }

  test("validation business rules (validation/schema.py:168-210)") {
    val good = Extract.parseMarkdown("d", e2eMarkdown)
    assert(Extract.validate(good).isEmpty)
    val bad = good.copy(contract_number = "N/A", client_name = "N/A",
      effective_date = "2025-01-01", expiration_date = "2024-01-01",
      total_value = Some(-5.0))
    val errs = Extract.validate(bad)
    assert(errs.contains("Contract must have a valid contract number"))
    assert(errs.contains("Contract must have a valid client name"))
    assert(errs.contains("Effective date must be before expiration date"))
    assert(errs.contains("Contract total value must be positive"))
  }

  test("JSON twin fixture (test_e2e_workflow.py:108-148, live goldens)") {
    val blocks = Seq(
      ("heading", "Service Agreement"),
      ("paragraph", "Contract Number: SA-2024-002"),
      ("paragraph", "Client: TestCorp"),
      ("paragraph", "Vendor: TestVendor"),
      ("paragraph", "Value: US$ 50,000.00"),
      ("paragraph", "Start Date: 2024-06-01"),
      ("paragraph", "End Date: 2024-12-31")
    ).zipWithIndex.map { case ((k, t), i) => Span(k, t, "", i) }
    val c = Extract.parseBlocks("sa2", blocks)
    assert(c.title == "Service Agreement")
    assert(c.contract_number == "SA-2024-002")
    assert(c.client_name == "TestCorp" && c.vendor_name == "TestVendor")
    assert(c.currency == "US$")          // 'US$', not 'USD' (pinned)
    assert(c.total_value.isEmpty)        // JSON path extracts no amount
    assert(c.effective_date == "2024-06-01") // ISO date in the first dated block
    assert(c.contract_type == "MSA")     // no keyword hit -> default
    assert(c.n_sections == 1)
    assert(math.abs(c.confidence - 0.7) < 1e-9)
  }

  test("MSA/SOW/PWO trio (test_e2e_workflow.py:278-350): types, parties, validation") {
    def md(title: String, num: String, value: String, d1: String, d2: String) =
      s"""# $title
         |**Contract Number:** $num
         |**Client:** TechCorp Inc.
         |**Vendor:** DevSolutions Ltd.
         |**Value:** $value
         |**Start Date:** $d1
         |**End Date:** $d2""".stripMargin
    val trio = Seq(
      ("Master Service Agreement", "MSA-2024-001", "R$ 500.000,00", "01/01/2024", "31/12/2026", "MSA"),
      ("Statement of Work", "SOW-2024-001", "R$ 100.000,00", "01/03/2024", "31/08/2024", "SOW"),
      ("Project Work Order", "PWO-2024-001", "R$ 50.000,00", "01/06/2024", "31/12/2024", "PWO"))
    val parsed = trio.map { case (t, n, v, d1, d2, _) =>
      Extract.parseMarkdown(n, md(t, n, v, d1, d2))
    }
    parsed.zip(trio).foreach { case (c, (_, n, _, _, _, typ)) =>
      assert(c.contract_number == n)
      assert(c.contract_type == typ)
      assert(c.client_name == "TechCorp Inc." && c.vendor_name == "DevSolutions Ltd.")
      assert(Extract.validate(c).isEmpty)   // e2e asserts 0 errors per file
    }
    // the reference tolerates total_value misses (R$ blocks the regex);
    // live run extracts none -> portfolio sum over extracted values is 0
    assert(parsed.flatMap(_.total_value).sum == 0.0)
  }

  test("accented pt-BR document matches the LIVE reference end-to-end (Unicode parity)") {
    // golden captured by running parse_from_markdown on this exact content:
    // {"name": "Acordo Quadro de Serviços", "number": "AQ-2024-117",
    //  "client": "N/A", "vendor": "N/A", "currency": "R$", "value": null,
    //  "eff": 2024-03-15, "exp": 2026-03-15, "type": MSA,
    //  "emails": ["contato@exemplo.com.br"], "cnpj": ["98.765.432/0001-10"],
    //  "clauses": [vigência, expiração, rescisão, pagamentos, pagamento,
    //              valor, obrigações], "nsec": 0, "conf": 0.6667}
    // Unicode behaviors exercised: (?i) folding on 'NÚMERO DO CONTRATO',
    // parties REJECTED (ç/ã outside the [A-Za-z\s&\.] class), josé@ email
    // excluded (é is a word char — no \b), accented clause headers hit.
    val md =
      """# Acordo Quadro de Serviços
        |NÚMERO DO CONTRATO: AQ-2024-117
        |CONTRATANTE: Construção Ltda FORNECEDOR: Serviços São Paulo SA
        |Valor: R$ 250.000,00
        |Data de vigência: 15/03/2024 Expiração: 15/03/2026
        |Vigência: válido por dois anos. Pagamentos: mensal.
        |Obrigações: conforme anexo. Rescisão: aviso prévio de 30 dias.
        |Email: josé@construção.br contato@exemplo.com.br
        |CNPJ: 98.765.432/0001-10
        |""".stripMargin
    val c = Extract.parseMarkdown("doc-acc", md)
    assert(c.title == "Acordo Quadro de Serviços")
    assert(c.contract_number == "AQ-2024-117")
    assert(c.client_name == "N/A" && c.vendor_name == "N/A")
    assert(c.currency == "R$")
    assert(c.total_value.isEmpty)
    assert(c.effective_date == "2024-03-15" && c.expiration_date == "2026-03-15")
    assert(c.contract_type == "MSA")
    assert(c.emails == Seq("contato@exemplo.com.br"))
    assert(c.cnpj_cpf == Seq("98.765.432/0001-10"))
    assert(c.key_clauses == Seq("vigência", "expiração", "rescisão",
      "pagamentos", "pagamento", "valor", "obrigações"))
    assert(c.n_sections == 0)
    assert(math.abs(c.confidence - 2.0 / 3) < 1e-9)
  }

  test("salted evidence merge == direct path on the fixture") {
    for (chunkSize <- Seq(2, 3, 5, 100)) {
      val evs = jsonBlocks.grouped(chunkSize).zipWithIndex
        .map { case (c, i) => Extract.chunkEvidence(i, c) }.toSeq
      val merged = Extract.mergeEvidence("doc-1", evs)
      val direct = Extract.parseBlocks("doc-1", jsonBlocks)
      assert(merged == direct, s"chunkSize=$chunkSize")
    }
  }
}
