package graft.queries

/** SQL twins of the Marker-style layout pass (extract/Layout.scala) —
  * column detection, reading order, block segmentation, figure/table
  * detection — oracle-checked value-exact vs DuckDB (SURVEY §2.1 SRC1/SRC2
  * layout semantics; north rule "block segmentation, reading-order sort,
  * table/figure detection").
  *
  * Input pages are derived deterministically from `lineitem` (the j02
  * pattern): one line box per lineitem row, two x-disjoint column bands
  * with intra-column jitter (exercises the interval merge), a y grid from
  * quantity (adjacent grid lines merge, skipped slots split blocks), and
  * occasional tall lines (suppkey % 11) that become figure regions.
  *
  * Every rule is a window function over integer geometry, identical in
  * both dialects:
  *  - column id  = cumulative count of "x0 > running max x1" breaks over
  *    the (x0, line_id) scan (1-D interval merge);
  *  - reading order = row_number over (col, y0, x0, line_id);
  *  - block id   = cumulative count of "y gap > VGap(13) or new column"
  *    breaks over the (col, y0, line_id) scan;
  *  - figure     = single-line block with height ≥ 35;
  *  - table row  = same y0 across ≥ 2 distinct columns; table = ≥ 2 rows.
  *
  * Spark plan shape (plan-guarded in PlanShapeSpec): one wide exchange —
  * hash by doc — feeds every window (l01/l02 run start to finish on that
  * single shuffle; the doc alias is applied BELOW the first window so
  * alias-aware partitioning propagates). l03/l04's table aggregations and
  * the block↔table-row join exchange only pre-aggregated (doc, y0) rows,
  * never the line set, and table-row detection is a min<>max hash agg,
  * not a count-distinct expand.
  */
object LayoutQueries {

  private def q(body: D => String): (String, String) =
    (body(Dialect.Spark), body(Dialect.Duck))

  /** Deterministic page geometry from lineitem (shared dialect subset).
    * line_id is a per-doc row_number, NOT l_linenumber — the synthetic
    * lineitem contains duplicate (orderkey, linenumber) pairs, and the
    * typed twin keys its column map by line_id; full-column ties order
    * identical rows, so the output set is engine-invariant. */
  val Lines: String =
    """lines AS (
      |  SELECT doc,
      |         CAST(row_number() OVER (PARTITION BY doc
      |              ORDER BY ln, pk, sk, qty, ep) AS INT) AS line_id,
      |         x0, x1, y0, y1
      |  FROM (
      |    SELECT l_orderkey AS doc, l_linenumber AS ln, l_partkey AS pk,
      |           l_suppkey AS sk, l_quantity AS qty, l_extendedprice AS ep,
      |           CAST(l_partkey % 2 AS INT) * 50 + CAST(l_suppkey % 3 AS INT) AS x0,
      |           CAST(l_partkey % 2 AS INT) * 50 + CAST(l_suppkey % 3 AS INT)
      |             + 38 + CAST(l_partkey % 5 AS INT) AS x1,
      |           CAST(floor(l_quantity) AS INT) % 25 * 12 AS y0,
      |           CAST(floor(l_quantity) AS INT) % 25 * 12
      |             + CASE WHEN l_suppkey % 11 = 0 THEN 40 ELSE 10 END AS y1
      |    FROM lineitem) raw)""".stripMargin

  /** Column assignment: interval merge via running-max window + cumsum. */
  private val Cols: String =
    """ord AS (
      |  SELECT *, max(x1) OVER (PARTITION BY doc ORDER BY x0, line_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_x1
      |  FROM lines),
      |cols AS (
      |  SELECT doc, line_id, x0, y0, x1, y1,
      |         CAST(sum(CASE WHEN prev_x1 IS NULL OR x0 > prev_x1 THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY doc ORDER BY x0, line_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) - 1 AS col
      |  FROM ord)""".stripMargin

  /** Line-level block ids: per-column y-gap breaks, global cumsum in
    * reading order. */
  private val Blocks: String =
    """seg AS (
      |  SELECT *, max(y1) OVER (PARTITION BY doc, col ORDER BY y0, line_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_y1
      |  FROM cols),
      |blocks AS (
      |  SELECT doc, line_id, x0, y0, x1, y1, col,
      |         CAST(sum(CASE WHEN prev_y1 IS NULL OR y0 - prev_y1 > 13 THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY doc ORDER BY col, y0, line_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) - 1 AS block_id
      |  FROM seg)""".stripMargin

  /** Table-row y0s: ≥ 2 distinct columns aligned on one y. col is an int,
    * so "≥ 2 distinct" is min <> max — a plain hash agg, no count-distinct
    * expand. */
  private val TableRows: String =
    """trows AS (
      |  SELECT doc, y0 FROM cols
      |  GROUP BY doc, y0 HAVING min(col) <> max(col))""".stripMargin

  private def sql(s: String): String =
    s.stripMargin.replace("\n", " ").replaceAll("\\s+", " ").trim

  /** Per-line OCR text for the x23 end-to-end fixture, keyed off line_id —
    * SHARED between the Spark-side line builder (SparkEntry x23) and the
    * DuckDB oracle below so the two sides can never diverge. */
  val LineTextCase: String =
    """CASE CAST(line_id % 7 AS INT)
      |  WHEN 1 THEN 'Master Service Agreement'
      |  WHEN 2 THEN 'Contract Number: MSA-2024-' || lpad(CAST(doc % 9999 AS STRING), 4, '0')
      |  WHEN 3 THEN 'Client: Acme Corp'
      |  WHEN 4 THEN 'Vendor: Beta Ltd'
      |  WHEN 5 THEN 'Effective Date: 01/03/2024 Expiration Date: 01/03/2026'
      |  ELSE 'Total Value: 1500,00' END""".stripMargin.replace("\n", " ")

  /** DuckDB oracle for x23_layout_extract — the l0* layout CTEs composed
    * with the JSON/block-path extraction fold (Extract.parseBlocks) in one
    * value-exact SQL twin:
    *
    *  - blocks + kinds re-derive `Layout.spansOf`'s classification
    *    (figure first, then table, then heading-at-page-top, else
    *    paragraph); figure blocks become media spans and drop out of the
    *    metadata fold exactly as parseBlocks filters them;
    *  - block text is the reading-order '\n'-join of line texts
    *    (`spansOf.joined`);
    *  - each metadata field replays BlockMeta's first-hit-wins fold:
    *    value from the MINIMUM-block_id paragraph whose extraction regex
    *    matches (the mayHave* prefilters never change the outcome — they
    *    only gate regex cost); party regexes use the consuming rewrite of
    *    the Java lookahead (group-1-identical for first matches, the p06
    *    precedent); the party fold REPLAYS the reference's dict-update
    *    overwrite quirk: updates stop at the first block where BOTH
    *    parties are defined (lock L = max(first client hit, first vendor
    *    hit)), and each party takes its LAST capture at or before L —
    *    multi-line blocks make captures differ across blocks, so
    *    first-match is genuinely wrong here (caught by the sf0.01 sweep);
    *  - sections replay `sectionsFromBlocks`: a heading counts when >= 1
    *    paragraph block sits between it and the next heading; the count is
    *    DISTINCT lowered heading text (Python dict keys);
    *  - the block path never extracts total_value, no text contains a
    *    currency token / email / CNPJ / clause header, and the type
    *    keywords resolve to MSA (or the MSA default) for every doc — so
    *    those columns are the same constants parseBlocks produces;
    *  - confidence is the P23 formula over the derived flags, rounded 4
    *    like flatContracts (score grid m/30 never ties at the 4th digit).
    */
  val X23OracleDuck: String = sql(s"""WITH $Lines, $Cols, $Blocks, $TableRows,
    |txt AS (
    |  SELECT doc, line_id, x0, y0, x1, y1, block_id, $LineTextCase AS text
    |  FROM blocks),
    |page AS (SELECT doc, min(y0) AS top_y FROM lines GROUP BY doc),
    |blk AS (
    |  SELECT t.doc, t.block_id, CAST(count(*) AS INT) AS n_lines,
    |         max(t.y1) - min(t.y0) AS height, min(t.y0) AS by0,
    |         CAST(sum(CASE WHEN tr.y0 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS ntl,
    |         string_agg(t.text, chr(10) ORDER BY t.y0, t.x0, t.line_id) AS btext
    |  FROM txt t LEFT JOIN trows tr ON t.doc = tr.doc AND t.y0 = tr.y0
    |  GROUP BY t.doc, t.block_id),
    |kinds AS (
    |  SELECT b.doc, b.block_id, b.btext,
    |         CASE WHEN b.n_lines = 1 AND b.height >= 35 THEN 'figure'
    |              WHEN b.ntl >= 2 THEN 'table'
    |              WHEN b.by0 = p.top_y THEN 'heading'
    |              ELSE 'paragraph' END AS kind
    |  FROM blk b JOIN page p ON b.doc = p.doc),
    |docs AS (SELECT DISTINCT doc FROM lines),
    |ttl AS (SELECT doc, arg_min(btext, block_id) AS title
    |        FROM kinds WHERE kind = 'heading' GROUP BY doc),
    |num AS (SELECT doc, arg_min(regexp_extract(btext,
    |          '(?i)(?:contract\\s+number|número\\s+do\\s+contrato|ref|reference)[\\s:]*([A-Z0-9\\-_/]+)', 1), block_id) AS num
    |        FROM kinds WHERE kind = 'paragraph' AND regexp_matches(btext,
    |          '(?i)(?:contract\\s+number|número\\s+do\\s+contrato|ref|reference)[\\s:]*([A-Z0-9\\-_/]+)')
    |        GROUP BY doc),
    |dts AS (SELECT doc, arg_min(btext, block_id) AS dtext
    |        FROM kinds WHERE kind = 'paragraph'
    |          AND regexp_matches(btext, '\\d{1,2}/\\d{1,2}/\\d{4}')
    |        GROUP BY doc),
    |cmatch AS (SELECT doc, block_id, trim(regexp_extract(btext,
    |          '(?i)(?:cliente|client|contratante|buyer)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?:\\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$$)', 1)) AS cap
    |        FROM kinds WHERE kind = 'paragraph' AND regexp_matches(btext,
    |          '(?i)(?:cliente|client|contratante|buyer)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?:\\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$$)')),
    |vmatch AS (SELECT doc, block_id, trim(regexp_extract(btext,
    |          '(?i)(?:fornecedor|vendor|contratado|seller|supplier)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?:\\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$$)', 1)) AS cap
    |        FROM kinds WHERE kind = 'paragraph' AND regexp_matches(btext,
    |          '(?i)(?:fornecedor|vendor|contratado|seller|supplier)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)(?:\\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$$)')),
    |locks AS (SELECT d.doc,
    |          (SELECT min(block_id) FROM cmatch c WHERE c.doc = d.doc) AS cmin,
    |          (SELECT min(block_id) FROM vmatch v WHERE v.doc = d.doc) AS vmin
    |          FROM docs d),
    |cli AS (SELECT c.doc, arg_max(c.cap, c.block_id) AS client
    |        FROM cmatch c JOIN locks l ON c.doc = l.doc
    |        WHERE l.vmin IS NULL OR c.block_id <= greatest(l.cmin, l.vmin)
    |        GROUP BY c.doc),
    |ven AS (SELECT v.doc, arg_max(v.cap, v.block_id) AS vendor
    |        FROM vmatch v JOIN locks l ON v.doc = l.doc
    |        WHERE l.cmin IS NULL OR v.block_id <= greatest(l.cmin, l.vmin)
    |        GROUP BY v.doc),
    |tbl AS (SELECT doc, CAST(count(*) AS INT) AS table_count
    |        FROM kinds WHERE kind = 'table' GROUP BY doc),
    |hp AS (SELECT doc, block_id, kind, btext FROM kinds
    |       WHERE kind = 'heading' OR kind = 'paragraph'),
    |hs AS (SELECT doc, block_id, lower(btext) AS hkey,
    |              lead(block_id) OVER (PARTITION BY doc ORDER BY block_id) AS nxt
    |       FROM hp WHERE kind = 'heading'),
    |secs AS (SELECT h.doc, CAST(count(DISTINCT h.hkey) AS INT) AS n_sections
    |         FROM hs h
    |         WHERE EXISTS (SELECT 1 FROM hp p
    |                       WHERE p.doc = h.doc AND p.kind = 'paragraph'
    |                         AND p.block_id > h.block_id
    |                         AND (h.nxt IS NULL OR p.block_id < h.nxt))
    |         GROUP BY h.doc)
    |SELECT 'doc-' || CAST(d.doc AS STRING) AS doc_id,
    |       ttl.title AS title,
    |       coalesce(num.num, 'N/A') AS contract_number,
    |       'USD' AS currency,
    |       CAST(NULL AS DOUBLE) AS total_value,
    |       CASE WHEN dts.dtext IS NOT NULL THEN CAST(CAST(strptime(
    |         regexp_extract_all(dts.dtext, '\\d{1,2}/\\d{1,2}/\\d{4}')[1],
    |         '%d/%m/%Y') AS DATE) AS STRING) END AS effective_date,
    |       CASE WHEN dts.dtext IS NOT NULL
    |             AND len(regexp_extract_all(dts.dtext, '\\d{1,2}/\\d{1,2}/\\d{4}')) >= 2
    |            THEN CAST(CAST(strptime(
    |         regexp_extract_all(dts.dtext, '\\d{1,2}/\\d{1,2}/\\d{4}')[2],
    |         '%d/%m/%Y') AS DATE) AS STRING) END AS expiration_date,
    |       coalesce(cli.client, 'N/A') AS client_name,
    |       coalesce(ven.vendor, 'N/A') AS vendor_name,
    |       'MSA' AS contract_type,
    |       '' AS emails,
    |       '' AS cnpj_cpf,
    |       coalesce(tbl.table_count, 0) AS table_count,
    |       '' AS key_clauses,
    |       coalesce(secs.n_sections, 0) AS n_sections,
    |       round(((CASE WHEN ttl.title IS NOT NULL AND ttl.title <> '' THEN 1e0 ELSE 0e0 END)
    |            + (CASE WHEN num.num IS NOT NULL THEN 1e0 ELSE 0e0 END)
    |            + (CASE WHEN cli.client IS NOT NULL AND ven.vendor IS NOT NULL THEN 1e0 ELSE 0e0 END)
    |            + (CASE WHEN dts.dtext IS NOT NULL THEN 1e0 ELSE 0e0 END)
    |            + (CASE WHEN coalesce(secs.n_sections, 0) > 0
    |                    THEN least(coalesce(secs.n_sections, 0) * 1e0 / 5, 1e0)
    |                    ELSE 0e0 END)) / 6e0, 4) AS confidence
    |FROM docs d
    |LEFT JOIN ttl ON d.doc = ttl.doc
    |LEFT JOIN num ON d.doc = num.doc
    |LEFT JOIN dts ON d.doc = dts.doc
    |LEFT JOIN cli ON d.doc = cli.doc
    |LEFT JOIN ven ON d.doc = ven.doc
    |LEFT JOIN tbl ON d.doc = tbl.doc
    |LEFT JOIN secs ON d.doc = secs.doc
    |ORDER BY doc_id""")

  /** DuckDB oracle for x17_layout_typed: the typed layoutBlocks output
    * re-derived as window SQL (l02 extents joined with l04 kinds), so the
    * DISTRIBUTED typed operator is hash-compared against DuckDB directly —
    * a stronger gate than the spec-level typed==SQL parity. */
  val X17OracleDuck: String = sql(s"""WITH $Lines, $Cols, $Blocks, $TableRows,
    |ext AS (
    |  SELECT doc, block_id, CAST(count(*) AS INT) AS n_lines,
    |         min(x0) AS x0, min(y0) AS y0, max(x1) AS x1, max(y1) AS y1
    |  FROM blocks GROUP BY doc, block_id),
    |tl AS (
    |  SELECT b.doc, b.block_id,
    |         CAST(sum(CASE WHEN t.y0 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS ntl
    |  FROM blocks b LEFT JOIN trows t ON b.doc = t.doc AND b.y0 = t.y0
    |  GROUP BY b.doc, b.block_id)
    |SELECT e.doc, e.block_id,
    |  CASE WHEN e.n_lines = 1 AND e.y1 - e.y0 >= 35 THEN 'figure'
    |       WHEN tl.ntl >= 2 THEN 'table' ELSE 'text' END AS kind,
    |  CASE WHEN e.n_lines = 1 AND e.y1 - e.y0 >= 35
    |       THEN 'img_' || CAST(e.doc AS STRING) || '_' || CAST(e.block_id AS STRING)
    |       ELSE '' END AS media_ref,
    |  e.n_lines, e.x0, e.y0, e.x1, e.y1
    |FROM ext e JOIN tl ON e.doc = tl.doc AND e.block_id = tl.block_id
    |ORDER BY e.doc, e.block_id""")

  val all: Map[String, (String, String)] = Map(

    // L1 — column detection + reading-order sort (XY-cut projection step)
    "l01_reading_order" -> q { _ =>
      sql(s"""WITH $Lines, $Cols
        |SELECT doc, line_id, col,
        |       CAST(row_number() OVER (PARTITION BY doc
        |            ORDER BY col, y0, x0, line_id) AS INT) AS reading_rank
        |FROM cols ORDER BY doc, line_id""")
    },

    // L2 — block segmentation: merged extents, line counts, figure flag
    "l02_block_segments" -> q { _ =>
      sql(s"""WITH $Lines, $Cols, $Blocks
        |SELECT doc, block_id, col,
        |       CAST(count(*) AS INT) AS n_lines,
        |       min(x0) AS bx0, min(y0) AS by0, max(x1) AS bx1, max(y1) AS by1,
        |       CASE WHEN count(*) = 1 AND max(y1) - min(y0) >= 35
        |            THEN 1 ELSE 0 END AS is_figure
        |FROM blocks GROUP BY doc, block_id, col
        |ORDER BY doc, block_id""")
    },

    // L3 — table detection: aligned-row grid stats per page
    "l03_table_detect" -> q { _ =>
      sql(s"""WITH $Lines, $Cols, $TableRows,
        |cells AS (
        |  SELECT c.doc, c.y0, CAST(count(*) AS INT) AS n_cells
        |  FROM cols c JOIN trows t ON c.doc = t.doc AND c.y0 = t.y0
        |  GROUP BY c.doc, c.y0)
        |SELECT doc, CAST(count(*) AS INT) AS n_table_rows,
        |       CAST(sum(n_cells) AS INT) AS n_cells,
        |       CASE WHEN count(*) >= 2 THEN 1 ELSE 0 END AS is_table
        |FROM cells GROUP BY doc ORDER BY doc""")
    },

    // L4 — block classification: figure / table / text + media_ref
    "l04_block_kinds" -> q { _ =>
      sql(s"""WITH $Lines, $Cols, $Blocks, $TableRows,
        |blk AS (
        |  SELECT b.doc, b.block_id,
        |         CAST(count(*) AS INT) AS n_lines,
        |         max(b.y1) - min(b.y0) AS height,
        |         CAST(sum(CASE WHEN t.y0 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_table_lines
        |  FROM blocks b LEFT JOIN trows t ON b.doc = t.doc AND b.y0 = t.y0
        |  GROUP BY b.doc, b.block_id)
        |SELECT doc, block_id,
        |       CASE WHEN n_lines = 1 AND height >= 35 THEN 'figure'
        |            WHEN n_table_lines >= 2 THEN 'table'
        |            ELSE 'text' END AS kind,
        |       CASE WHEN n_lines = 1 AND height >= 35
        |            THEN 'img_' || CAST(doc AS STRING) || '_' || CAST(block_id AS STRING)
        |            ELSE '' END AS media_ref
        |FROM blk ORDER BY doc, block_id""")
    }
  )
}
