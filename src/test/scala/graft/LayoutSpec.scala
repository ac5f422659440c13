package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Layout
import graft.extract.Layout.Box

/** Marker-style layout pass (extract/Layout.scala):
  *  - human-expected behavior on a crafted two-column page;
  *  - typed-vs-SQL parity against the l01/l02/l04 oracle queries on real
  *    derived pages (the DuckDB-checked twins);
  *  - repartition invariance of the distributed path.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // A two-column page: left column = title line + a two-line paragraph,
  // right column = one paragraph line + a tall figure region; plus a
  // two-row table grid spanning both columns at y=200/212.
  //                       id   x0   y0   x1   y1
  val page = Seq(
    Box(1, 5, 0, 45, 10),       // L title
    Box(2, 5, 30, 44, 40),      // L para line 1  (gap 20 from title -> new block)
    Box(3, 6, 42, 45, 52),      // L para line 2  (gap 2 -> merges)
    Box(4, 55, 2, 95, 12),      // R para line (y offset: NOT row-aligned with the title)
    Box(5, 55, 60, 93, 100),    // R figure (height 40, isolated)
    Box(6, 5, 200, 44, 210),    // table row 1, left cell
    Box(7, 55, 200, 94, 210),   // table row 1, right cell
    Box(8, 5, 212, 44, 222),    // table row 2, left cell
    Box(9, 55, 212, 94, 222)    // table row 2, right cell
  )

  test("columns: x-interval merge finds the two bands despite jitter") {
    val cols = Layout.columnOf(page)
    assert(Seq(1L, 2L, 3L, 6L, 8L).forall(cols(_) == 0))
    assert(Seq(4L, 5L, 7L, 9L).forall(cols(_) == 1))
  }

  test("reading order: left column top-down, then right column") {
    val ranks = Layout.readingOrder(page).map { case (b, _, r) => b.line_id -> r }.toMap
    // left col by y: 1, 2, 3, 6, 8 then right col: 4, 5, 7, 9
    assert(ranks === Map(1L -> 1, 2L -> 2, 3L -> 3, 6L -> 4, 8L -> 5,
      4L -> 6, 5L -> 7, 7L -> 8, 9L -> 9))
  }

  test("segmentation + classification: para merge, figure, table blocks") {
    val segs = Layout.segments(page)
    // left col: title | para(2 lines) | table rows (200,212 merge: gap 2)
    // right col: para | figure | table rows
    assert(segs.size === 6)
    val byId = segs.map(s => s.block_id -> s).toMap
    assert(byId(0).n_lines === 1 && byId(0).kind === "text")   // title
    assert(byId(1).n_lines === 2 && byId(1).kind === "text")   // merged para
    assert(byId(1).y0 === 30 && byId(1).y1 === 52)
    assert(byId(2).n_lines === 2 && byId(2).kind === "table")  // left cells
    assert(byId(3).kind === "text")                            // right para
    assert(byId(4).n_lines === 1 && byId(4).kind === "figure") // tall block
    assert(byId(5).kind === "table")                           // right cells
  }

  test("table stat: two aligned rows, four cells") {
    assert(Layout.tableStat(page) === ((2, 4, true)))
  }

  test("degenerate pages: empty and single-box inputs") {
    assert(Layout.columnOf(Seq.empty) === Map.empty)
    assert(Layout.readingOrder(Seq.empty) === Seq.empty)
    assert(Layout.segments(Seq.empty) === Seq.empty)
    assert(Layout.tableStat(Seq.empty) === ((0, 0, false)))
    assert(Layout.spansOf("d", Seq.empty, Map.empty) === Seq.empty)
    val one = Seq(Box(1, 0, 0, 40, 10))
    assert(Layout.readingOrder(one).map(_._3) === Seq(1))
    assert(Layout.segments(one).map(_.kind) === Seq("text"))
    assert(Layout.spansOf("d", one, Map(1L -> "t")).map(_.kind) === Seq("heading"))
  }

  test("single-column page: no table, one column") {
    val boxes = Seq(Box(1, 0, 0, 40, 10), Box(2, 2, 12, 38, 22))
    assert(Layout.columnOf(boxes).values.toSet === Set(0))
    assert(Layout.tableStat(boxes) === ((0, 0, false)))
    assert(Layout.segments(boxes).map(_.kind) === Seq("text"))
  }

  // ---- typed vs SQL twins on the real derived pages ----

  private def boxesByDoc(): Map[Long, Seq[Box]] = {
    val df = {
      spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
      spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("lineitem")
      spark.sql("WITH " + graft.queries.LayoutQueries.Lines.replace("\n", " ") +
        " SELECT doc, line_id, x0, y0, x1, y1 FROM lines")
    }
    df.collect().groupBy(_.getLong(0)).map { case (d, rows) =>
      d -> rows.toSeq.map(r => Box(r.getInt(1).toLong, r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    }
  }

  test("typed readingOrder == l01 SQL on derived pages") {
    val sqlRows = SparkEntry.queries("l01_reading_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val typed = boxesByDoc().flatMap { case (d, bs) =>
      Layout.readingOrder(bs).map { case (b, c, rank) => (d, b.line_id.toInt, c, rank) }
    }.toSet
    assert(typed === sqlRows)
  }

  test("typed segments == l02 SQL on derived pages") {
    val sqlRows = SparkEntry.queries("l02_block_segments")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8))).toSet
    val typed = boxesByDoc().flatMap { case (d, bs) =>
      Layout.segments(bs).map { s =>
        (d, s.block_id, s.col, s.n_lines, s.x0, s.y0, s.x1, s.y1,
          if (s.kind == "figure") 1 else 0)
      }
    }.toSet
    assert(typed === sqlRows)
  }

  test("typed block kinds == l04 SQL on derived pages") {
    val sqlRows = SparkEntry.queries("l04_block_kinds")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    val typed = boxesByDoc().flatMap { case (d, bs) =>
      Layout.segments(bs).map { s =>
        (d, s.block_id, s.kind,
          if (s.kind == "figure") s"img_${d}_${s.block_id}" else "")
      }
    }.toSet
    assert(typed === sqlRows)
  }

  test("typed tableStat == l03 SQL on derived pages") {
    val sqlRows = SparkEntry.queries("l03_table_detect")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val typed = boxesByDoc().flatMap { case (d, bs) =>
      val (rows, cells, isTable) = Layout.tableStat(bs)
      if (rows > 0) Some((d, rows, cells, if (isTable) 1 else 0)) else None
    }.toSet
    assert(typed === sqlRows)
  }

  test("spansOf bridges layout into the interleaved Span shape and feeds Extract") {
    val texts = Map(
      1L -> "Master Service Agreement", 2L -> "Contract Number: K-0042",
      3L -> "Client: Acme Corp Vendor: Beta Ltd", 4L -> "Total Value: US$ 50,000.00",
      5L -> "", 6L -> "| a | b |", 7L -> "| c | d |", 8L -> "| 1 | 2 |", 9L -> "| 3 | 4 |")
    val spans = Layout.spansOf("d1", page, texts)
    assert(spans.map(_.offset) === (0 until 6))
    assert(spans.map(_.kind) === Seq("heading", "paragraph", "table",
      "paragraph", "media", "table"))
    assert(spans.find(_.kind == "media").get.media_ref === "img_d1_4")
    // the merged left paragraph keeps both lines in reading order
    assert(spans(1).text === "Contract Number: K-0042\nClient: Acme Corp Vendor: Beta Ltd")
    // the bridge output parses end-to-end on the block path
    val row = graft.extract.Extract.parseBlocks("d1", spans)
    assert(row.title === "Master Service Agreement")
    assert(row.contract_number === "K-0042")
    assert(row.client_name === "Acme Corp")
  }

  test("bands: a full-width title no longer fuses the columns") {
    // title spans the whole page; naive x-merge would collapse both
    // columns into one and interleave their reading order by y
    val p = Seq(
      Box(1, 0, 0, 95, 10),      // full-width title (band separator)
      Box(2, 5, 20, 44, 30),     // L1
      Box(3, 5, 32, 44, 42),     // L2
      Box(4, 55, 20, 95, 30),    // R1
      Box(5, 55, 32, 95, 42),    // R2
      Box(6, 0, 60, 94, 70),     // full-width section rule (second separator)
      Box(7, 5, 80, 44, 90),     // L3
      Box(8, 55, 80, 95, 90))    // R3
    // naive: one fused column, y-interleaved
    val naive = Layout.readingOrder(p).map(_._1.line_id)
    assert(Layout.columnOf(p).values.toSet.size === 1)
    assert(naive === Seq(1L, 2L, 4L, 3L, 5L, 6L, 7L, 8L)) // L/R interleaved
    // banded: title, then left column, then right column, per band
    val banded = Layout.readingOrderBanded(p).map(_._1.line_id)
    assert(banded === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    val ranks = Layout.readingOrderBanded(p).map(_._4)
    assert(ranks === (1 to 8))
    // no separators -> identical to the plain path
    val noSep = page
    assert(Layout.readingOrderBanded(noSep).map(t => t._1.line_id -> t._4).toMap ===
      Layout.readingOrder(noSep).map(t => t._1.line_id -> t._3).toMap)
  }

  test("segmentsBanded: separators are their own blocks, columns segment per band") {
    val p = Seq(
      Box(1, 0, 0, 95, 10),      // full-width title
      Box(2, 5, 20, 44, 30), Box(3, 5, 32, 44, 42),   // L para (merges)
      Box(4, 55, 20, 95, 30), Box(5, 55, 32, 95, 42)) // R para (merges)
    val segs = Layout.segmentsBanded(p)
    assert(segs.map(_.block_id) === (0 until 3))
    assert(segs.map(_.n_lines) === Seq(1, 2, 2))
    assert(segs.head.x0 === 0 && segs.head.x1 === 95) // the title block
    // without bands the fused column yields y-interleaved merge: one big block
    assert(Layout.segments(p).map(_.n_lines) === Seq(5))
  }

  test("extractFromLines: positioned lines -> layout -> spans -> contract, distributed") {
    import spark.implicits._
    val texts = Map(
      1L -> "Master Service Agreement", 2L -> "Contract Number: K-0042",
      3L -> "Client: Acme Corp Vendor: Beta Ltd", 4L -> "Total Value: US$ 50,000.00",
      5L -> "", 6L -> "| a | b |", 7L -> "| c | d |", 8L -> "| 1 | 2 |", 9L -> "| 3 | 4 |")
    val lines = page.map(b => (7L, b.line_id, b.x0, b.y0, b.x1, b.y1, texts(b.line_id)))
      .toDF("doc", "line_id", "x0", "y0", "x1", "y1", "text")
    val rows = graft.extract.Layout.extractFromLines(lines.repartition(5)).collect()
    assert(rows.length === 1)
    val row = rows.head
    assert(row.doc_id === "doc-7")
    assert(row.title === "Master Service Agreement")
    assert(row.contract_number === "K-0042")
    assert(row.client_name === "Acme Corp")
    assert(row.vendor_name === "Beta Ltd")
    assert(row.table_count >= 1)
  }

  test("distributed layoutBlocks is repartition-invariant") {
    import spark.implicits._
    val lines = page.map(b => (7L, b.line_id, b.x0, b.y0, b.x1, b.y1))
      .toDF("doc", "line_id", "x0", "y0", "x1", "y1")
    val a = Layout.layoutBlocks(lines).collect().toSet
    val b = Layout.layoutBlocks(lines.repartition(7)).collect().toSet
    assert(a === b)
    assert(a.size === 6)
  }
}
