package graft.queries

/** Join / aggregation / window / sort / incremental operator queries
  * (SURVEY §2.3-2.7, §2.9) as dialect-shared SQL bodies. Spark-side plans
  * verified with explain(): hash aggregates with partial (map-side)
  * aggregation, broadcast hash joins for the dimension joins, single
  * shuffle per window. */
object RelationalQueries {

  private def q(body: D => String): (String, String) =
    (body(Dialect.Spark), body(Dialect.Duck))

  val all: Map[String, (String, String)] = Map(

    // J1 — contract hierarchy self equi-join (parent linkage + membership)
    "j01_hierarchy" -> q { d =>
      """WITH contracts AS (
        |  SELECT doc_id, 'C' || CAST(doc_id AS STRING) AS contract_number,
        |         CASE WHEN doc_id % 10 = 0 THEN NULL
        |              ELSE 'C' || CAST(doc_id - doc_id % 10 AS STRING) END AS parent_number
        |  FROM documents)
        |SELECT c.doc_id, c.contract_number, c.parent_number,
        |       CASE WHEN p.contract_number IS NOT NULL THEN 1 ELSE 0 END AS parent_found
        |FROM contracts c LEFT JOIN contracts p ON c.parent_number = p.contract_number
        |ORDER BY c.doc_id""".stripMargin.replace("\n", " ")
    },

    // J2 — spatial theta-join + per-line argmax (bbox intersection,
    // table_processor_fixed.py:237-294, reduced to 1-D intervals).
    // Spark side (r7 shape): the four cells of an order are a PURE
    // FUNCTION of j — their geometry (cx0 = j*25, cx1 = j*25+25) never
    // reads `orders` — so the line-cell join reduces to (a) a LEFT SEMI
    // join on orderkey for the existence filter the inner join implied,
    // and (b) a per-row greatest() over the four j terms in place of the
    // 4x cells explode + join (guide §3.3: join first on the un-exploded
    // key, explode after — here the explode disappears entirely). Each
    // term packs (inter, cell) as m_j = inter_j * 4 + (3 - j), the same
    // integer argmax encoding as before; max over join rows == max over
    // lines of greatest over j, so the GROUP BY (which still merges
    // duplicate (orderkey, linenumber) line rows) is unchanged. Plan:
    // 2 exchanges + a 2.4M-row join intermediate -> 1 exchange (the
    // partial+final agg), semi-join keys only — at any scale the semi
    // join moves orderkeys, never cell rows. Oracle keeps the row_number
    // form; identical output incl. the cell_id-asc tiebreak.
    "j02_spatial_argmax" -> q { d =>
      if (d.isSpark)
        """WITH lines AS (
          |  SELECT l_orderkey, l_linenumber,
          |         CAST(l_partkey % 80 AS INT) AS x0,
          |         CAST(l_partkey % 80 + l_suppkey % 20 + 5 AS INT) AS x1
          |  FROM lineitem),
          |best AS (
          |  SELECT l.l_orderkey, l.l_linenumber,
          |         max(greatest(
          |           greatest(0, least(l.x1, 25) - greatest(l.x0, 0)) * 4 + 3,
          |           greatest(0, least(l.x1, 50) - greatest(l.x0, 25)) * 4 + 2,
          |           greatest(0, least(l.x1, 75) - greatest(l.x0, 50)) * 4 + 1,
          |           greatest(0, least(l.x1, 100) - greatest(l.x0, 75)) * 4)) AS m
          |  FROM lines l LEFT SEMI JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  GROUP BY l.l_orderkey, l.l_linenumber)
          |SELECT l_orderkey, l_linenumber, CAST(3 - m % 4 AS INT) AS cell_id,
          |       CAST(m DIV 4 AS INT) AS inter
          |FROM best WHERE m DIV 4 > 0
          |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", " ")
      else
        """WITH lines AS (
          |  SELECT l_orderkey, l_linenumber,
          |         CAST(l_partkey % 80 AS INT) AS x0,
          |         CAST(l_partkey % 80 + l_suppkey % 20 + 5 AS INT) AS x1
          |  FROM lineitem),
          |cells AS (
          |  SELECT o_orderkey AS c_orderkey, j AS cell_id,
          |         j * 25 AS cx0, j * 25 + 25 AS cx1
          |  FROM orders, (VALUES (0), (1), (2), (3)) AS cj(j)),
          |scored AS (
          |  SELECT l.l_orderkey, l.l_linenumber, c.cell_id,
          |         greatest(0, least(l.x1, c.cx1) - greatest(l.x0, c.cx0)) AS inter,
          |         row_number() OVER (PARTITION BY l.l_orderkey, l.l_linenumber
          |                            ORDER BY greatest(0, least(l.x1, c.cx1) - greatest(l.x0, c.cx0)) DESC, c.cell_id) AS rn
          |  FROM lines l JOIN cells c ON l.l_orderkey = c.c_orderkey)
          |SELECT l_orderkey, l_linenumber, cell_id, inter
          |FROM scored WHERE rn = 1 AND inter > 0
          |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", " ")
    },

    // J4 + A2 — dimension broadcast joins: customer -> nation -> region rollup
    "j04_region_rollup" -> q { d =>
      """SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin.replace("\n", " ")
    },

    // J5 — broadcast nested-loop pattern match: best pattern per doc by
    // word-overlap score (entity_extractor.py:197-226 re-expressed)
    "j05_pattern_match" -> q { d =>
      val words = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
      val pwords = "regexp_extract_all(p.pat, '[a-z0-9]+', 0)"
      val inter = if (d.isSpark) s"array_intersect($words, $pwords)"
                  else s"list_intersect($words, $pwords)"
      s"""WITH pats AS (SELECT pat FROM (VALUES ('information technology data management'),
         | ('cloud services agreement'), ('supply chain consulting services')) AS p(pat))
         |SELECT doc_id, pat AS best_pattern, score FROM (
         |  SELECT doc_id, p.pat, ${d.size(inter)} AS score,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY ${d.size(inter)} DESC, p.pat) AS rn
         |  FROM documents CROSS JOIN pats p) x
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // A7 — exact interpolated quantiles per group (the distribution-shape
    // report every corpus audit ships). Spark `percentile` and DuckDB
    // `quantile_cont` share the interpolation rule — probed value-equal at
    // round(4). Exact percentile buffers a group's values, so THIS form is
    // the parity baseline; at 10^12 rows the scale path is
    // approx_percentile (x24, rows-only — sketches aren't cross-engine
    // exact), the same baseline/scale-twin split as d06/x13.
    "a07_value_quantiles" -> q { d =>
      val qf: (String, String) => String = (c, p) =>
        if (d.isSpark) s"round(percentile($c, $p), 4)"
        else s"round(quantile_cont($c, $p), 4)"
      s"""SELECT l_returnflag,
         |  ${qf("l_extendedprice", "0.25")} AS q25,
         |  ${qf("l_extendedprice", "0.5")} AS q50,
         |  ${qf("l_extendedprice", "0.95")} AS q95,
         |  round(max(l_extendedprice), 2) AS qmax
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin.replace("\n", " ")
    },

    // A8 — distribution moments per group: stddev / correlation /
    // covariance (identical SQL-standard definitions both engines; rounded
    // so accumulation-order float noise cannot flip a digit). One partial
    // hash agg — the moment sketches are mergeable, so this IS the scale
    // shape (unlike a07's exact percentile).
    "a08_distribution_stats" -> q { d =>
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_discount, l_extendedprice), 4) AS cov_disc_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin.replace("\n", " ")
    },

    // A9 — histogram: fixed-width binning + count per bin (the corpus
    // length/size histograms every audit report carries). Floor-div bin
    // arithmetic (width_bucket is missing in DuckDB 1.0) -> one hash agg;
    // bins with no rows are absent in both engines.
    "a09_price_histogram" -> q { d =>
      """SELECT CAST(floor(l_extendedprice * 1e0 / 10000) AS INT) AS bin,
        |  count(*) AS n, round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")
    },

    // A10 — ROLLUP subtotals (the multi-level summary report shape).
    // Subtotal rows' NULL keys are coalesced to a label IN the projection:
    // Spark sorts NULLS FIRST and DuckDB NULLS LAST, so ordering on the
    // coalesced value is the only dialect-stable form. Spark plans this
    // as one Expand + hash agg — no extra pass per level.
    "a10_rollup" -> q { d =>
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin.replace("\n", " ")
    },

    // A2/A4 — TPC-H Q1-style pricing summary (flagship hash agg)
    "a01_pricing" -> q { d =>
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " ")
    },

    // A2 — count-by-type summaries
    "a02_counts" -> q { d =>
      "SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source ORDER BY lang, source"
    },

    // A3 — mean metrics per group
    "a03_doc_stats" -> q { d =>
      """SELECT source, count(*) AS n, round(avg(n_chars), 4) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")
    },

    // A4 — portfolio sum
    "a04_portfolio" -> q { d =>
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin.replace("\n", " ")
    },

    // A5 — success/failure tallies
    "a05_event_tallies" -> q { d =>
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " ")
    },

    // O1 — top-k by aggregate (deterministic tiebreak)
    "o01_topk_users" -> q { d =>
      """SELECT user_id, round(sum(value), 4) AS total, count(*) AS n
        |FROM events GROUP BY user_id
        |ORDER BY round(sum(value), 4) DESC, user_id LIMIT 10""".stripMargin.replace("\n", " ")
    },

    // O7 — analysis-vs-expected field scoring + ranking report
    // (scripts/test_advanced_analysis.py:125-177): string fields score
    // 1.0/0.0 on exact match, list fields score |expected ∩ actual| /
    // |expected| (1.0 when nothing is expected), overall = mean over the
    // six key fields, report sorted by score. Expected/actual pairs are
    // planted with controlled mismatches so every branch is exercised.
    "o07_analysis_score" -> q { d =>
      def contains(arr: String, x: String) =
        if (d.isSpark) s"array_contains($arr, $x)" else s"list_contains($arr, $x)"
      val actualParties =
        if (d.isSpark) "CASE WHEN doc_id % 3 = 0 THEN array('Acme Corp') ELSE array('Acme Corp', 'Beta Ltd') END"
        else "CASE WHEN doc_id % 3 = 0 THEN ['Acme Corp'] ELSE ['Acme Corp', 'Beta Ltd'] END"
      val fields =
        s"""SELECT doc_id,
           |  CASE WHEN doc_id % 5 = 0 THEN 'WRONG' ELSE 'K-' || CAST(doc_id AS STRING) END AS a_id,
           |  CASE WHEN doc_id % 7 = 0 THEN 'Other' ELSE 'Contract ' || CAST(doc_id AS STRING) END AS a_name,
           |  CASE WHEN doc_id % 11 = 3 THEN 'LSA' ELSE 'MSA' END AS a_type,
           |  $actualParties AS a_parties
           |FROM documents""".stripMargin.replace("\n", " ")
      val sId = "CASE WHEN a_id = 'K-' || CAST(doc_id AS STRING) THEN 1e0 ELSE 0e0 END"
      val sName = "CASE WHEN a_name = 'Contract ' || CAST(doc_id AS STRING) THEN 1e0 ELSE 0e0 END"
      val sType = "CASE WHEN a_type = 'MSA' THEN 1e0 ELSE 0e0 END"
      val sParties = s"(CASE WHEN ${contains("a_parties", "'Acme Corp'")} THEN 1 ELSE 0 END" +
        s" + CASE WHEN ${contains("a_parties", "'Beta Ltd'")} THEN 1 ELSE 0 END) * 1e0 / 2"
      // parent expected = ['C' || group base]; planted actual always has it
      val sParent = "1e0"
      // child expected = [] -> score 1.0 by the reference's empty rule
      val sChild = "1e0"
      s"""SELECT doc_id, round($sId, 2) AS s_id, round($sName, 2) AS s_name,
         | round($sType, 2) AS s_type, round($sParties, 2) AS s_parties,
         | round(($sId + $sName + $sType + $sParties + $sParent + $sChild) / 6, 4) AS overall
         | FROM ($fields) t
         | ORDER BY round(($sId + $sName + $sType + $sParties + $sParent + $sChild) / 6, 4) DESC, doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // W2 — keep-highest per key (A1 dedup shape)
    "w02_keep_highest" -> q { d =>
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events) x WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin.replace("\n", " ")
    },

    // W5 — explicit sequence reassembly after shuffle (span-order invariant)
    "w05_event_order" -> q { d =>
      if (d.isSpark)
        """SELECT user_id, concat_ws('>', transform(
          |  array_sort(collect_list(struct(ts, event_id, event_type))),
          |  x -> x.event_type)) AS seq
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " ")
      else
        """SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " ")
    },

    // Streaming-shaped hourly windowed aggregation (batch twin of the
    // Structured Streaming job; see StreamingSpec)
    "w06_hourly" -> q { d =>
      s"""SELECT ${d.ts2s("date_trunc('hour', ts)")} AS hour_ts, event_type,
         |  count(*) AS n, round(sum(value), 4) AS sum_value
         |FROM events GROUP BY ${d.ts2s("date_trunc('hour', ts)")}, event_type
         |ORDER BY hour_ts, event_type""".stripMargin.replace("\n", " ")
    },

    // W7 — ntile quartiles: size-quartile assignment per doc (the corpus
    // "bucket by length percentile" stratification move). Deterministic
    // full ordering (n_chars, doc_id) so tile boundaries cannot flip
    // between engines.
    "w07_ntile_quartiles" -> q { d =>
      """SELECT doc_id, n_chars,
        |  CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS INT) AS size_quartile
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // W8 — lag deltas: per-user inter-event gap seconds and value delta
    // (sessionization's first step; one window over the (user, ts) sort).
    "w08_event_deltas" -> q { d =>
      val prevTs = "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
      // exact microsecond epochs in both engines — second-level helpers
      // floor per-timestamp (Spark) vs per-interval (DuckDB) and go off
      // by one when sub-second parts straddle
      val gap =
        // ts is TIMESTAMP_NTZ; session TZ is UTC, so the cast is lossless
        if (d.isSpark) s"unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST($prevTs AS TIMESTAMP))"
        else s"epoch_us(ts) - epoch_us($prevTs)"
      s"""SELECT user_id, event_id,
         |  coalesce($gap, -1) AS gap_us,
         |  round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0), 4) AS value_delta
         |FROM events ORDER BY user_id, event_id""".stripMargin.replace("\n", " ")
    },

    // W9 — RANGE frame + first_value: trailing-hour event count per user
    // (a numeric RANGE over exact epoch micros — interval RANGE literals
    // differ across engines, epoch arithmetic doesn't) and the user's
    // first event value. RANGE includes order-key peers by definition in
    // both engines.
    "w09_trailing_hour" -> q { d =>
      val us =
        if (d.isSpark) "unix_micros(CAST(ts AS TIMESTAMP))"
        else "epoch_us(ts)"
      s"""WITH e AS (SELECT user_id, event_id, $us AS us, value FROM events)
         |SELECT user_id, event_id,
         |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY us
         |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS INT) AS n_trailing_hour,
         |  round(first_value(value) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id), 4) AS first_val
         |FROM e ORDER BY user_id, event_id""".stripMargin.replace("\n", " ")
    },

    // W10 — gap-based SESSIONIZATION, the canonical event-stream window
    // op: a new session opens when a user's inter-event gap exceeds 30
    // minutes; session id = running sum of new-session flags; then
    // per-session stats. Exact epoch-micro arithmetic (the w08/w09
    // idiom), explicit ROWS frame for the running sum, window sums CAST
    // (DuckDB sum -> HUGEINT). Scale shape: one hash exchange on
    // user_id feeds lag + the running sum + the final group-by — no
    // extra shuffle, and per-user partitions are bounded by that user's
    // event count.
    "w10_sessions" -> q { d =>
      val us =
        if (d.isSpark) "unix_micros(CAST(ts AS TIMESTAMP))"
        else "epoch_us(ts)"
      s"""WITH e AS (SELECT user_id, event_id, value, $us AS ts_us FROM events),
         |lagd AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
         |flagged AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM lagd),
         |sess AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id FROM flagged)
         |SELECT user_id, session_id, CAST(count(*) AS INT) AS n_events,
         |  CAST(min(ts_us) AS BIGINT) AS start_us,
         |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
         |  round(sum(value), 4) AS session_value
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin.replace("\n", " ")
    },

    // S1 — retry-queue batch filter
    "s01_retry_ready" -> q { d =>
      """SELECT event_id AS item_id, attempts FROM (
        |  SELECT event_id,
        |         CAST(floor(value * 10) AS INT) % 5 AS attempts,
        |         CASE WHEN event_type IN ('click', 'view') THEN 'failed' ELSE 'ok' END AS status,
        |         ts
        |  FROM events) x
        |WHERE status = 'failed' AND attempts < 3 AND ts <= TIMESTAMP '2024-06-01 00:00:00'
        |ORDER BY event_id""".stripMargin.replace("\n", " ")
    }
  )
}
