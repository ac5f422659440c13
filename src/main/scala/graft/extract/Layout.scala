package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, collect_list, struct}

/** Marker-style 2-D layout parse (SRC1/SRC2 semantics, north rule: "block
  * segmentation, reading-order sort, table/figure detection").
  *
  * The reference delegates this step to the Marker library
  * (services/pdf_converter.py:178-285 drives it; the block-JSON shape it
  * consumes back is :353-359) — layout itself happens inside Marker's
  * layout model. This module re-derives the layout pass from the page
  * geometry with deterministic, SQL-twin-able rules:
  *
  *  1. **Column detection** — classic x-interval merge (the 1-D projection
  *     step of recursive XY-cut): scan line boxes by (x0, line_id); a box
  *     starts a new column iff its x0 lies strictly right of the running
  *     max x1 of all boxes scanned so far. Overlapping/touching x-intervals
  *     share a column.
  *  2. **Reading order** — sort by (column, y0, x0, line_id): columns
  *     left-to-right, top-to-bottom within a column — Marker's reading
  *     order for multi-column pages.
  *  3. **Block segmentation** — within a column, y-sorted lines merge into
  *     one block while the gap to the running max y1 is ≤ `VGap`; block ids
  *     are global per page in reading order.
  *  4. **Figure detection** — a single-line block taller than
  *     `FigMinHeight` is a figure region (image regions have no line
  *     structure); it gets a media_ref.
  *  5. **Table detection** — a y-row with cells in ≥ 2 distinct columns is
  *     a table row; ≥ 2 table rows make a table region, and a block with
  *     ≥ 2 of its lines on table rows is a table block.
  *
  * Steps 1+3 together are one full XY-cut iteration (an x-projection cut
  * into columns, then y-projection cuts into blocks). Real pages rarely
  * nest deeper; a further recursion level would reapply `columnOf` inside
  * each block — the rules are written as pure page-local functions so that
  * composition needs no new machinery.
  *
  * Every rule is integer arithmetic over sorted sequences, so each has a
  * window-function SQL twin (queries/LayoutQueries.scala l01–l04,
  * oracle-checked value-exact vs DuckDB); LayoutSpec additionally pins
  * typed-vs-SQL equality on real derived pages and the human-expected
  * order on a crafted two-column page.
  *
  * Scale: the typed path runs per page group — `layoutBlocks` shuffles once
  * on doc_id and everything after is a per-group fold (no further exchange,
  * no sort of the whole corpus). When pages arrive pre-nested (the
  * interleaved input shape), the pure functions apply inside the existing
  * narrow per-doc map with zero shuffles. Skew note: unlike documents
  * (unbounded span counts → the salted Pipeline path), a PAGE is
  * physically bounded — a PDF page holds O(10^2..10^3) line boxes — so
  * per-group folds and per-doc window partitions never see corpus-scale
  * groups; no salting is needed at this stage.
  */
object Layout {

  /** Vertical merge gap: consecutive lines ≤ VGap apart join one block. */
  val VGap = 13
  /** Minimum height for a single-line block to classify as a figure. */
  val FigMinHeight = 35

  /** A positioned line box on a page (layout IR before text assembly). */
  case class Box(line_id: Long, x0: Int, y0: Int, x1: Int, y1: Int)

  /** A segmented block: global per-page id in reading order, extent,
    * line count, and kind ∈ {text, table, figure}. */
  case class Block(block_id: Int, col: Int, n_lines: Int,
                   x0: Int, y0: Int, x1: Int, y1: Int, kind: String)

  /** 1. Column id per line (x-interval merge, new column iff
    * x0 > running max x1 over the (x0, line_id) scan). */
  def columnOf(boxes: Seq[Box]): Map[Long, Int] = {
    var maxX1 = Int.MinValue
    var colId = -1
    val out = Map.newBuilder[Long, Int]
    for (b <- boxes.sortBy(b => (b.x0, b.line_id))) {
      if (colId < 0 || b.x0 > maxX1) colId += 1
      if (b.x1 > maxX1) maxX1 = b.x1
      out += b.line_id -> colId
    }
    out.result()
  }

  /** 2. Reading order: (line, col, 1-based rank) sorted by
    * (col, y0, x0, line_id). */
  def readingOrder(boxes: Seq[Box]): Seq[(Box, Int, Int)] = {
    val cols = columnOf(boxes)
    boxes.sortBy(b => (cols(b.line_id), b.y0, b.x0, b.line_id))
      .zipWithIndex
      .map { case (b, i) => (b, cols(b.line_id), i + 1) }
  }

  /** Table-row y0s: y-rows whose lines span ≥ 2 distinct columns. */
  def tableRowYs(boxes: Seq[Box]): Set[Int] = {
    val cols = columnOf(boxes)
    boxes.groupBy(_.y0).collect {
      case (y, bs) if bs.map(b => cols(b.line_id)).distinct.size >= 2 => y
    }.toSet
  }

  /** Line → (block id, col) tagging shared by segments/spansOf. */
  private def taggedLines(boxes: Seq[Box]): Seq[(Int, Int, Box)] = {
    val cols = columnOf(boxes)
    val ordered = boxes.sortBy(b => (cols(b.line_id), b.y0, b.line_id))
    var curCol = -1
    var prevY1 = Int.MinValue
    var blockId = -1
    ordered.map { b =>
      val c = cols(b.line_id)
      val newBlock = c != curCol || b.y0 - prevY1 > VGap
      if (c != curCol) { curCol = c; prevY1 = Int.MinValue }
      if (newBlock) blockId += 1
      if (b.y1 > prevY1) prevY1 = b.y1
      (blockId, c, b)
    }
  }

  /** 3.–5. Segment lines into blocks and classify each block.
    * Returns blocks with global per-page ids in reading order. */
  def segments(boxes: Seq[Box]): Seq[Block] = {
    val tys = tableRowYs(boxes)
    taggedLines(boxes).groupBy(_._1).toSeq.sortBy(_._1).map { case (blk, ts) =>
      val bs = ts.map(_._3)
      val height = bs.map(_.y1).max - bs.map(_.y0).min
      val kind =
        if (bs.size == 1 && height >= FigMinHeight) "figure"
        else if (bs.count(b => tys(b.y0)) >= 2) "table"
        else "text"
      Block(blk, ts.head._2, bs.size, bs.map(_.x0).min, bs.map(_.y0).min,
        bs.map(_.x1).max, bs.map(_.y1).max, kind)
    }
  }

  /** Per-page table stats (the l03 twin): number of table rows, number of
    * cells on them, and the ≥2-row table flag. */
  def tableStat(boxes: Seq[Box]): (Int, Int, Boolean) = {
    val tys = tableRowYs(boxes)
    val cells = boxes.count(b => tys(b.y0))
    (tys.size, cells, tys.size >= 2)
  }

  /** Horizontal band split — the recursion step naive x-projection needs
    * for pages where a FULL-WIDTH element (title, horizontal rule, banner)
    * spans both columns: its x-interval would fuse the columns into one
    * and interleave their reading order. Lines at least `spanFrac` of the
    * page width are band separators; each separator is its own band, and
    * the remaining lines fall into the band below the nearest separator
    * above them (band index = count of separators with y0 ≤ the line's
    * y0). Bands come back in top-down y order. The l0* SQL twins model the
    * no-spanning-line case (which their derivation guarantees); this typed
    * pre-pass handles the general page. */
  def bands(boxes: Seq[Box], spanFrac: Double = 0.7): Seq[Seq[Box]] = {
    if (boxes.isEmpty) return Seq.empty
    val px0 = boxes.map(_.x0).min
    val px1 = boxes.map(_.x1).max
    val width = px1 - px0
    val (seps, rest) = boxes.partition(b =>
      width > 0 && (b.x1 - b.x0).toDouble / width >= spanFrac)
    if (seps.isEmpty) return Seq(boxes)
    val bounds = seps.map(_.y0).distinct.sorted
    def bandIdx(y: Int): Int = bounds.count(_ <= y)
    val sepBands = seps.groupBy(b => bandIdx(b.y0)) // separators at a bound
    val restBands = rest.groupBy(b => bandIdx(b.y0))
    (0 to bounds.length).flatMap { i =>
      // the separator(s) OPENING band i sort before the band body
      val opener = sepBands.getOrElse(i, Seq.empty).sortBy(b => (b.y0, b.line_id))
      val body = restBands.getOrElse(i, Seq.empty)
      (if (opener.nonEmpty && body.nonEmpty) Seq(opener, body)
       else if (opener.nonEmpty) Seq(opener)
       else if (body.nonEmpty) Seq(body)
       else Seq.empty)
    }
  }

  /** Reading order with the band pre-pass: (line, band, col, global rank).
    * Within a band, `readingOrder`'s column rules apply unchanged. */
  def readingOrderBanded(boxes: Seq[Box],
                         spanFrac: Double = 0.7): Seq[(Box, Int, Int, Int)] = {
    var rank = 0
    bands(boxes, spanFrac).zipWithIndex.flatMap { case (band, bi) =>
      readingOrder(band).map { case (b, c, _) =>
        rank += 1
        (b, bi, c, rank)
      }
    }
  }

  /** Block segmentation with the band pre-pass: `segments`' rules per
    * band, block ids renumbered globally in band order (a full-width
    * separator line segments as its own block). */
  def segmentsBanded(boxes: Seq[Box], spanFrac: Double = 0.7): Seq[Block] = {
    var offset = 0
    bands(boxes, spanFrac).flatMap { band =>
      val segs = segments(band)
      val out = segs.map(s => s.copy(block_id = s.block_id + offset))
      offset += segs.size
      out
    }
  }

  /** Bridge into the engine's interleaved input shape (BASELINE input_hint):
    * ordered blocks → Span sequence, offsets = reading-order block ids, so
    * the layout output feeds `Extract.parseBlocks`/`markdownOf` directly.
    * `texts` carries per-line OCR/text content keyed by line_id ("" lines
    * allowed); figure blocks become media spans with their media_ref, table
    * blocks keep their lines joined in reading order. A text block whose
    * first line is the page's topmost becomes the heading (Marker's
    * title-block convention for the block-JSON path). */
  def spansOf(doc: String, boxes: Seq[Box],
              texts: Map[Long, String]): Seq[graft.model.Span] = {
    if (boxes.isEmpty) return Seq.empty
    val tys = tableRowYs(boxes)
    val topY = boxes.map(_.y0).min
    taggedLines(boxes).groupBy(_._1).toSeq.sortBy(_._1).map { case (blk, ts) =>
      val bs = ts.map(_._3)
      val joined = bs.sortBy(b => (b.y0, b.x0, b.line_id))
        .flatMap(b => texts.get(b.line_id)).filter(_.nonEmpty).mkString("\n")
      val height = bs.map(_.y1).max - bs.map(_.y0).min
      if (bs.size == 1 && height >= FigMinHeight)
        graft.model.Span("media", "", s"img_${doc}_$blk", blk)
      else if (bs.count(b => tys(b.y0)) >= 2)
        graft.model.Span("table", joined, "", blk)
      else if (bs.head.y0 == topY)
        graft.model.Span("heading", joined, "", blk)
      else
        graft.model.Span("paragraph", joined, "", blk)
    }
  }

  /** The full north-rule narrative in one distributed operator: positioned
    * OCR lines → layout (columns, reading order, segmentation, kinds) →
    * interleaved Span sequence → contract extraction. One shuffle on doc,
    * then the per-page layout fold and the per-doc `Extract.parseBlocks`
    * run narrowly inside the same task.
    * Input columns: doc (long), line_id (long), x0..y1 (int), text
    * (string, may be null for figure lines). */
  def extractFromLines(lines: DataFrame): Dataset[graft.model.ContractRow] = {
    val spark: SparkSession = lines.sparkSession
    import spark.implicits._
    // collect_list hash-agg instead of groupByKey/mapGroups (r7): the
    // upstream line derivation is already hash-partitioned on doc (its
    // row_number window), and a hash aggregate rides that partitioning —
    // where MapGroups forced a second exchange PLUS a per-partition sort
    // on the appended typed key. Pages are physically bounded (the same
    // per-group-buffer assumption mapGroups made); the fold itself is
    // order-independent (every layout rule sorts internally).
    lines
      .select(col("doc").cast("long").as("doc"),
        struct(col("line_id").cast("long").as("line_id"),
          col("x0").cast("int").as("x0"), col("y0").cast("int").as("y0"),
          col("x1").cast("int").as("x1"), col("y1").cast("int").as("y1"),
          col("text").cast("string").as("text")).as("b"))
      .groupBy("doc").agg(collect_list(col("b")).as("bs"))
      .as[(Long, Seq[(Long, Int, Int, Int, Int, String)])]
      .map { case (doc, rows) =>
        val boxes = rows.map(r => Box(r._1, r._2, r._3, r._4, r._5))
        val texts = rows.iterator.map(r => r._1 -> Option(r._6).getOrElse("")).toMap
        Extract.parseBlocks(s"doc-$doc", spansOf(doc.toString, boxes, texts))
      }
  }

  /** Distributed typed path: one shuffle on `doc`, then a per-page fold.
    * Input columns: doc (long), line_id (int/long), x0, y0, x1, y1 (int).
    * Output: one row per block, ids in reading order — the interleaved
    * span sequence a downstream `Extract` pass consumes. */
  def layoutBlocks(lines: DataFrame): DataFrame = {
    val spark: SparkSession = lines.sparkSession
    import spark.implicits._
    // collect_list hash-agg instead of groupByKey/flatMapGroups (r7) —
    // same exchange/sort elimination as extractFromLines above: the line
    // derivation is already partitioned on doc, so the aggregate adds NO
    // exchange and no sort (plan: 2 Exchange + 2 Sort -> 1 Exchange +
    // 1 Sort, the window's own).
    lines
      .select(col("doc").cast("long").as("doc"),
        struct(col("line_id").cast("long").as("line_id"),
          col("x0").cast("int").as("x0"), col("y0").cast("int").as("y0"),
          col("x1").cast("int").as("x1"), col("y1").cast("int").as("y1")).as("b"))
      .groupBy("doc").agg(collect_list(col("b")).as("bs"))
      .as[(Long, Seq[(Long, Int, Int, Int, Int)])]
      .flatMap { case (doc, rows) =>
        val boxes = rows.map(r => Box(r._1, r._2, r._3, r._4, r._5))
        segments(boxes).map { b =>
          (doc, b.block_id, b.kind,
            if (b.kind == "figure") s"img_${doc}_${b.block_id}" else "",
            b.n_lines, b.x0, b.y0, b.x1, b.y1)
        }
      }
      .toDF("doc", "block_id", "kind", "media_ref", "n_lines",
        "x0", "y0", "x1", "y1")
  }
}
