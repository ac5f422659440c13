package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Doc, Span}

/** Deterministic synthesizer of the interleaved text+media corpus
  * (BASELINE.json `input_hint`: doc_id + ordered typed spans).
  *
  * Derives one contract-shaped document per row of the driver-provided
  * `documents.parquet` seed table (doc_id, text, ...). Everything is a pure
  * function of `doc_id` + the seed text — no wall clock, no RNG state —
  * so the corpus is bit-reproducible at any scale and under any
  * partitioning (SURVEY §7.4.5).
  *
  * The rendered documents mirror the reference's own test fixtures
  * (tests/parser/test_contract_parser.py:26-73): heading/paragraph blocks
  * carrying contract number, parties, amounts, dates, clause sections —
  * interleaved with html boilerplate spans (nav/footer with link farms vs
  * content divs, exercising P26), pure media spans, and markdown tables.
  * ~1% of docs form a skew tail with `MegaFactor`× the body spans to
  * exercise the salted repartition path (SURVEY §4).
  */
object Corpus {

  /** splitmix64 — public-domain mixing function; stable across JVMs. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pick[T](h: Long, shift: Int, xs: IndexedSeq[T]): T =
    xs((((h >>> shift) % xs.length + xs.length) % xs.length).toInt)

  // Manual zero-pad / digit-grouping (java.util.Formatter via f"" costs
  // ~1us per call through locale machinery — this is the synth hot path).
  private def pad2(n: Long): String = if (n < 10) "0" + n else n.toString
  private def padN(n: Long, width: Int): String = {
    val s = n.toString
    if (s.length >= width) s else "0" * (width - s.length) + s
  }
  private def grouped(n: Long, sep: Char): String = {
    val s = n.toString
    val sb = new StringBuilder
    var i = 0
    val first = s.length % 3
    while (i < s.length) {
      if (i != 0 && (i - first) % 3 == 0) sb.append(sep)
      sb.append(s.charAt(i)); i += 1
    }
    sb.result()
  }

  val Clients: IndexedSeq[String] = IndexedSeq(
    "TechCorp Inc.", "Global Finance SA", "Acme Holdings", "Banco Azul SA",
    "Norte Energia Ltda", "Prime Retail Group", "Delta Logistics Co.",
    "Vertex Pharma AG")
  val Vendors: IndexedSeq[String] = IndexedSeq(
    "DevSolutions Ltd.", "CloudWorks GmbH", "DataBridge Services",
    "InfraNet Partners", "Quantum Consulting", "Skyline Systems",
    "NimbusSoft SA", "Orbital Analytics")
  /** (type keyword rendered in the title, expected detected type). The
    * detector's priority quirks (bare "cr" etc.) are avoided here by using
    * full phrases; quirk coverage lives in the unit tests. */
  val TypePhrases: IndexedSeq[String] = IndexedSeq(
    "Master Service Agreement", "Local Service Agreement",
    "Statement of Work", "Project Work Order", "Change Request",
    "Change Notification Form")
  val TypeCodes: IndexedSeq[String] =
    IndexedSeq("MSA", "LSA", "SOW", "PWO", "CR", "CNF")

  val MegaModulus = 101      // doc_id % 101 == 0 -> mega doc
  val MegaFactor = 64        // body repetition factor for the skew tail

  /** Render one deterministic document. `seedText` feeds filler paragraphs. */
  def synth(docId: Long, seedText: String): Doc = {
    val h = mix(docId)
    val hasNumber = (h & 0xf) != 0           // ~6% missing contract number
    val hasDates = ((h >>> 4) & 0xf) < 13    // ~19% missing dates
    val hasParties = ((h >>> 8) & 0xf) != 1  // ~6% missing parties
    val typeIdx = (((h >>> 12) % 6 + 6) % 6).toInt
    val client = pick(h, 16, Clients)
    val vendor = pick(h, 20, Vendors)
    val year = 2019 + (((h >>> 24) % 7 + 7) % 7).toInt
    val month = 1 + (((h >>> 28) % 12 + 12) % 12).toInt
    val day = 1 + (((h >>> 32) % 28 + 28) % 28).toInt
    val amountCents = ((h >>> 36) & 0xffffff) + 1000
    val number = TypeCodes(typeIdx) + "-" + year + "-" + padN((h >>> 44) & 0xfff, 4)
    val curIdx = (((h >>> 40) % 4 + 4) % 4).toInt

    // Amount rendered in one of the reference's four locale shapes (P4).
    val units = amountCents / 100; val cents = amountCents % 100
    val br = grouped(units, '.') + "," + pad2(cents)
    val us = grouped(units, ',') + "." + pad2(cents)
    val amountStr = curIdx match {
      case 0 => s"R$$ $br"
      case 1 => s"US$$ $us"
      case 2 => s"€ $br"
      case _ => br
    }

    val d1 = pad2(day) + "/" + pad2(month) + "/" + year
    val d2 = pad2(day) + "/" + pad2(month) + "/" + (year + 2)

    val b = Vector.newBuilder[(String, String, String)] // (kind, text, media_ref)
    // html boilerplate: link-farm nav (stripped by P26) before content
    b += (("html", s"""<div class="nav"><a href="/h">Home</a> <a href="/c">Contracts</a> <a href="/a">About</a> <a href="/l">Legal</a></div>""", ""))
    b += (("heading", s"${TypePhrases(typeIdx)}", ""))
    b += (("paragraph", s"Contract Information", ""))
    if (hasNumber) b += (("paragraph", s"Contract Number: $number", ""))
    if (hasParties) {
      b += (("paragraph", s"Client: $client", ""))
      b += (("paragraph", s"Vendor: $vendor", ""))
    }
    b += (("paragraph", s"Total Value: $amountStr", ""))
    if (hasDates) {
      b += (("paragraph", s"Effective Date: $d1", ""))
      b += (("paragraph", s"Expiration Date: $d2", ""))
    }
    b += (("media", "", s"corpus://img/$docId-0.jpg"))
    b += (("heading", "Key Clauses", ""))
    b += (("paragraph", s"Vigência: valid from $year.", ""))
    b += (("paragraph", s"Pagamentos: monthly invoicing applies.", ""))
    b += (("paragraph", s"Confidencialidade: all terms are confidential.", ""))
    b += (("table", "| item | qty |\n|---|---|\n| support | 12 |", ""))
    b += (("paragraph", s"Email: contact${docId % 97}@corp${docId % 13}.com", ""))
    val cnpj = pad2((h >>> 3) % 90 + 10) + "." + padN((h >>> 7) % 900 + 100, 3) + "." +
      padN((h >>> 13) % 900 + 100, 3) + "/0001-" + pad2((h >>> 17) % 90 + 10)
    b += (("paragraph", s"CNPJ: $cnpj", ""))

    // filler body from the seed text, repeated for the skew tail. The seed
    // text is an unpunctuated word stream, so pseudo-sentences are 6-word
    // groups — this gives mega docs a real span fan-out (~600 spans vs ~26,
    // a ~25x straggler without salting).
    val reps = if (docId % MegaModulus == 0) MegaFactor else 1
    val sentences = Option(seedText).getOrElse("")
      .split(" ").iterator.filter(_.nonEmpty).grouped(6)
      .map(_.mkString(" ")).take(8).toVector
    var r = 0
    while (r < reps) {
      b += (("heading", s"Annex $r", ""))
      for (s <- sentences) b += (("paragraph", s, ""))
      if (((h >>> r % 32) & 3) == 0) b += (("media", "", s"corpus://img/$docId-${r + 1}.jpg"))
      r += 1
    }
    // html boilerplate: content div (kept by P26) + footer link farm
    b += (("html", s"""<div class="main"><p>Execution terms for contract $number follow the master schedule and annexes described above in this document body.</p></div>""", ""))
    b += (("html", s"""<div class="footer"><a href="/p">Privacy</a> <a href="/t">Terms</a> <a href="/s">Sitemap</a></div>""", ""))

    val spans = b.result().zipWithIndex.map { case ((k, t, mr), i) => Span(k, t, mr, i) }
    Doc(s"doc-$docId", spans)
  }

  /** The synthesized corpus as a typed Dataset, seeded from the driver's
    * documents table.
    *
    * The seed table is tiny but the per-row work (synth + downstream
    * extraction) is CPU-heavy — the classic small-input/heavy-map shape.
    * A single parquet file would otherwise scan as ONE partition and
    * serialize the whole job on one core, so we explicitly repartition the
    * seed rows to 2x the cluster slots (cheap: rows are short strings;
    * 2x over-decomposition smooths the mega-doc skew tail across slots).
    *
    * `replicate` emits k deterministic variants per seed row (disjoint
    * doc_id spaces) — used by benchmarks to scale work without new data. */
  def corpus(spark: SparkSession, sfDir: String, replicate: Int = 1): Dataset[Doc] = {
    import spark.implicits._
    val slots = spark.sparkContext.defaultParallelism
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .repartition(slots * 2)
      .flatMap { case (id, text) =>
        (0 until replicate).iterator.map(r => synth(id + r.toLong * 10000000L, text))
      }
  }

  /** Dump the synthesized span table to parquet — the oracle bridge for
    * corpus-derived driver queries: DuckDB cannot run `synth` (splitmix64
    * needs wrapping 64-bit multiplies), but it CAN read the dumped rows
    * and re-derive pure-arithmetic results over them (x09's density-strip
    * counts). Verify/ProbeQ overwrite this once per sweep, right before
    * oracle_sql.json, so the DuckDB pass that follows reads the dump of
    * the SAME sfDir it is comparing. */
  def dumpSpans(spark: SparkSession, sfDir: String, outPath: String): Unit = {
    import spark.implicits._
    corpus(spark, sfDir)
      .flatMap(d => d.spans.map(s => (d.doc_id, s.kind, s.text, s.media_ref, s.offset)))
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
      .write.mode("overwrite").parquet(outPath)
  }
}
