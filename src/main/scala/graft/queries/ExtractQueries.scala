package graft.queries

import graft.queries.Dialect.{Ctext, Fname}

/** Scalar-extraction operator queries (SURVEY §2.2), one per operator,
  * written as dialect-shared SQL bodies over the `documents` table with the
  * planted contract-text column. Each entry yields (sparkSql, duckSql);
  * the Spark side runs via spark.sql over a temp view — same Catalyst plan
  * a DataFrame chain would produce (verified with explain: single project
  * over the parquet scan, whole-stage codegen).
  *
  * Every query ORDERs BY its key and rounds doubles so the driver's
  * hash-compare is deterministic across engines.
  */
object ExtractQueries {

  /** Standard FROM clause exposing the planted columns. */
  private def src(extra: String = ""): String =
    s"FROM (SELECT doc_id, $Ctext AS ctext, $Fname AS fname, text, lang, source, n_chars $extra FROM documents) t"

  private def q(body: D => String): (String, String) =
    (body(Dialect.Spark), body(Dialect.Duck))

  // Reference patterns (services/contract_parser.py:27-37) — common subset
  private val PatTitle = "'(?m)^#{1,2}\\s+(.+)$'"
  private val PatNum = "'(?i)(?:contract\\s+number|número\\s+do\\s+contrato|ref|reference)[\\s:]*([A-Z0-9\\-_/]+)'"
  private val PatCur = "'(?i)(R\\$|US\\$|USD|BRL|EUR|€|£)'"
  private val PatAmt = "'(?i)(?:valor|value|amount|total)[\\s:]*([R$US$USD€£]?\\s*[\\d,]+\\.?\\d*)'"
  private val PatEmail = "'\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b'"
  private val PatCnpj = "'(?:\\d{2}\\.\\d{3}\\.\\d{3}/\\d{4}-\\d{2}|\\d{3}\\.\\d{3}\\.\\d{3}-\\d{2})'"
  private val PatDmy = "'(\\d{1,2})/(\\d{1,2})/(\\d{4})'"
  private val PatYmd = "'(\\d{4})-(\\d{1,2})-(\\d{1,2})'"
  private val PatYear = "'\\b(19|20)\\d{2}\\b'"
  // P6 party patterns: Spark keeps the reference lookahead; the oracle uses
  // the consuming rewrite (same group-1 on first match; RE2 has no lookahead)
  private def patClient(d: D): String = {
    val tail = if (d.isSpark) "(?=\\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$)"
               else "(?:\\s+(?:vendor|fornecedor|contratado|seller|supplier|prestador|provider|contractor)|$)"
    s"'(?i)(?:cliente|client|contratante|buyer)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)$tail'"
  }
  private def patVendor(d: D): String = {
    val tail = if (d.isSpark) "(?=\\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$)"
               else "(?:\\s+(?:cliente|client|contratante|buyer|empresa|company|corporation)|$)"
    s"'(?i)(?:fornecedor|vendor|contratado|seller|supplier)[\\s:]*([A-Z][A-Za-z\\s&\\.]+?)$tail'"
  }

  /** The 23 key-clause section headers (contract_parser.py:41-48),
    * shared by P11 and the P23 confidence oracle. */
  private val ClauseHeaders = Seq(
    "vigência", "duração", "termo", "prazo", "expiração",
    "rescisão", "terminação", "cancelamento",
    "confidencialidade", "sigilo", "não divulgação",
    "pagamentos", "pagamento", "valor", "preço", "compensação",
    "obrigações", "responsabilidades", "deveres",
    "foro", "jurisdição", "lei aplicável", "disputas")

  /** Shared amount-parse chain (P4): strip class, locale branch, try_cast. */
  private def amountParse(d: D, raw: String): String = {
    val strip = d.rr(raw, "'[R$US$USD€£\\s]'", "''")
    s"""CASE WHEN $strip LIKE '%,%' AND $strip LIKE '%.%'
       | THEN try_cast(replace(replace($strip, '.', ''), ',', '.') AS DOUBLE)
       | WHEN $strip LIKE '%,%' THEN try_cast(replace($strip, ',', '.') AS DOUBLE)
       | ELSE try_cast($strip AS DOUBLE) END""".stripMargin.replace("\n", " ")
  }

  val all: Map[String, (String, String)] = Map(

    // P1 — first H1/H2 title
    "p01_title" -> q { d =>
      s"SELECT doc_id, regexp_extract(ctext, $PatTitle, 1) AS title ${src()} ORDER BY doc_id"
    },

    // P2 — contract number (plain pattern; '' when missing, like reference None->'N/A' downstream)
    "p02_number" -> q { d =>
      s"""SELECT doc_id, CASE WHEN regexp_extract(ctext, $PatNum, 1) = '' THEN 'N/A'
         | ELSE regexp_extract(ctext, $PatNum, 1) END AS contract_number ${src()} ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // P3 — first currency token
    "p03_currency" -> q { d =>
      s"SELECT doc_id, regexp_extract(ctext, $PatCur, 1) AS currency ${src()} ORDER BY doc_id"
    },

    // P4 — labeled amount extract + locale parse (incl. the US$ quirk).
    // Spark side uses the native codegen'd ParseAmount expression; the
    // oracle uses the equivalent SQL chain (value parity in FunctionsSpec).
    "p04_amount" -> q { d =>
      val raw = s"regexp_extract(ctext, $PatAmt, 1)"
      val parsed = if (d.isSpark) s"parse_amount($raw)" else amountParse(d, raw)
      s"SELECT doc_id, round($parsed, 4) AS total_value ${src()} ORDER BY doc_id"
    },

    // P5 — date extraction: valid-only, per-pattern text order
    "p05_dates" -> q { d =>
      val dmyAll = s"regexp_extract_all(ctext, $PatDmy, 0)"
      val valid = d.lfilter(dmyAll, s"x -> ${d.dok("x", "d/M/yyyy", "%d/%m/%Y")}")
      val isoArr = d.lmap(valid, s"x -> ${d.d2iso("x", "d/M/yyyy", "%d/%m/%Y")}")
      val ymdFirst = s"regexp_extract(ctext, $PatYmd, 0)"
      s"""SELECT doc_id, ${d.idx(isoArr, 0)} AS effective_date,
         | ${d.idx(isoArr, 1)} AS expiration_date,
         | ${d.size(valid)} AS n_valid_dmy,
         | ${d.d2iso(ymdFirst, "y-M-d", "%Y-%m-%d")} AS first_iso_date
         | ${src()} ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // P6 — parties (lookahead on Spark, consuming rewrite on DuckDB)
    "p06_parties" -> q { d =>
      s"""SELECT doc_id,
         | trim(regexp_extract(ctext, ${patClient(d)}, 1)) AS client_name,
         | trim(regexp_extract(ctext, ${patVendor(d)}, 1)) AS vendor_name
         | ${src()} ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // P7 — contract type: priority keyword chain incl. bare-substring quirks
    "p07_type" -> q { d =>
      s"""SELECT doc_id, CASE
         | WHEN lower(ctext) LIKE '%master service agreement%' OR lower(ctext) LIKE '%msa%' OR lower(ctext) LIKE '%acordo quadro%' THEN 'MSA'
         | WHEN lower(ctext) LIKE '%local service agreement%' OR lower(ctext) LIKE '%lsa%' OR lower(ctext) LIKE '%acordo local%' THEN 'LSA'
         | WHEN lower(ctext) LIKE '%statement of work%' OR lower(ctext) LIKE '%sow%' OR lower(ctext) LIKE '%escopo de trabalho%' THEN 'SOW'
         | WHEN lower(ctext) LIKE '%project work order%' OR lower(ctext) LIKE '%pwo%' OR lower(ctext) LIKE '%ordem de serviço%' THEN 'PWO'
         | WHEN lower(ctext) LIKE '%change request%' OR lower(ctext) LIKE '%cr%' OR lower(ctext) LIKE '%solicitação de mudança%' THEN 'CR'
         | WHEN lower(ctext) LIKE '%change notification form%' OR lower(ctext) LIKE '%cnf%' OR lower(ctext) LIKE '%formulário de notificação%' THEN 'CNF'
         | ELSE 'NONE' END AS contract_type ${src()} ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // P8 — emails: findall, dedup, sorted, joined '; ' (SNK4 list rendering)
    "p08_emails" -> q { d =>
      val arr = s"regexp_extract_all(ctext, $PatEmail, 0)"
      val dedup = if (d.isSpark) s"array_join(array_sort(array_distinct($arr)), '; ')"
                  else s"coalesce(array_to_string(list_sort(list_distinct($arr)), '; '), '')"
      s"SELECT doc_id, $dedup AS emails ${src()} ORDER BY doc_id"
    },

    // P9 — CNPJ/CPF ids, same rendering
    "p09_cnpj" -> q { d =>
      val arr = s"regexp_extract_all(ctext, $PatCnpj, 0)"
      val dedup = if (d.isSpark) s"array_join(array_sort(array_distinct($arr)), '; ')"
                  else s"coalesce(array_to_string(list_sort(list_distinct($arr)), '; '), '')"
      s"SELECT doc_id, $dedup AS cnpj_cpf ${src()} ORDER BY doc_id"
    },

    // P10 — markdown table lines + header detection
    "p10_tables" -> q { d =>
      val lines = s"regexp_extract_all(ctext, '(?m)^\\|.*\\|$$', 0)"
      val hdr = d.size(d.lfilter(lines, "x -> x LIKE '%---%'"))
      s"SELECT doc_id, ${d.size(lines)} AS table_lines, CASE WHEN $hdr > 0 THEN true ELSE false END AS has_headers ${src()} ORDER BY doc_id"
    },

    // P11 — key-clause flags over ALL 23 section headers
    // (contract_parser.py:41-48; substring-of-lowered-content semantics).
    // `clause_bits` packs the per-header flags in list order; `key_clauses`
    // renders the present headers '; '-joined (the SNK4 list shape).
    "p11_clauses" -> q { d =>
      val bits = ClauseHeaders.map(h =>
        s"CASE WHEN lower(ctext) LIKE '%$h%' THEN '1' ELSE '0' END")
      val present = ClauseHeaders.map(h =>
        s"CASE WHEN lower(ctext) LIKE '%$h%' THEN '$h' ELSE '' END")
      s"""SELECT doc_id,
         | ${bits.mkString(" || ")} AS clause_bits,
         | ${d.joinNonEmpty(present, "; ")} AS key_clauses
         | ${src()} ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // P12 — ASCII-safe predicate over planted filenames
    "p12_ascii" -> q { d =>
      val re = "'^[\\x00-\\x7f]*$'"
      val pred = if (d.isSpark) s"fname RLIKE $re" else s"regexp_matches(fname, $re)"
      s"SELECT doc_id, fname, CASE WHEN $pred THEN 1 ELSE 0 END AS is_safe ${src()} ORDER BY doc_id"
    },

    // P13/P14 — deterministic CJK term-map sanitize (columnar variant of
    // Rules.sanitizeFilename: replace-chain over the base name + cleanup;
    // the quote-removal step is a no-op on filename-legal input). Reference
    // order: '御見積書' before '見積書' before '見積'; '契約' before '契約書'
    // (so '契約書' is consumed as '契約'+'書' -> 'Contract書' never arises on
    // planted data; chain kept in Python dict order).
    "p13_sanitize" -> q { d =>
      val base = "substr(fname, 1, length(fname) - 4)"
      val mapped = Seq(
        "【" -> "", "】" -> "", "御見積書" -> "Quotation", "見積書" -> "Quotation",
        "見積" -> "Estimate", "請求書" -> "Invoice", "契約" -> "Contract",
        "契約書" -> "Contract", "システム" -> "System", "運用" -> "Operations",
        "サポート" -> "Support", "合同" -> "Contract", "报价" -> "Quotation",
        "系统" -> "System", "支持" -> "Support")
        .foldLeft(base) { case (e, (k, v)) => s"replace($e, '$k', '$v')" }
      val cleaned = d.rr(d.rr(s"($mapped)", "'[^\\w\\s\\-]'", "'_'"), "'\\s+'", "'_'")
      s"SELECT doc_id, $cleaned || '.pdf' AS sanitized ${src()} ORDER BY doc_id"
    },

    // P16 — sentence segmentation + heuristic class (explode/unnest)
    "p16_segments" -> q { d =>
      val cls = """CASE
        | WHEN lower(seg) LIKE '%$%' OR lower(seg) LIKE '%€%' OR lower(seg) LIKE '%£%' OR lower(seg) LIKE '%amount%' OR lower(seg) LIKE '%value%' OR lower(seg) LIKE '%cost%' THEN 'amount'
        | WHEN lower(seg) LIKE '%date%' OR lower(seg) LIKE '%effective%' OR lower(seg) LIKE '%expiration%' OR lower(seg) LIKE '%valid%' THEN 'date'
        | WHEN lower(seg) LIKE '%contract%' OR lower(seg) LIKE '%agreement%' OR lower(seg) LIKE '%sow%' OR lower(seg) LIKE '%msa%' THEN 'identifier'
        | ELSE 'none' END""".stripMargin.replace("\n", " ")
      if (d.isSpark)
        s"""SELECT doc_id, seg, $cls AS seg_class FROM (
           | SELECT doc_id, trim(s) AS seg FROM (SELECT doc_id, $Ctext AS ctext, text FROM documents) t
           | LATERAL VIEW explode(split(ctext, '\\.')) sv AS s
           |) x WHERE length(seg) >= 10 AND $cls <> 'none' ORDER BY doc_id, seg"""
          .stripMargin.replace("\n", " ")
      else
        s"""SELECT doc_id, seg, $cls AS seg_class FROM (
           | SELECT doc_id, trim(unnest(string_split_regex(ctext, '\\.'))) AS seg
           | FROM (SELECT doc_id, $Ctext AS ctext, text FROM documents) t
           |) x WHERE length(seg) >= 10 AND $cls <> 'none' ORDER BY doc_id, seg"""
          .stripMargin.replace("\n", " ")
    },

    // P17 — entity normalization incl. the digit-stripping AMOUNT mangle
    "p17_normalize" -> q { d =>
      val etype = "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'AMOUNT' WHEN 1 THEN 'START_DATE' ELSE 'SUPPLIER' END"
      val etext = "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'R$ ' || CAST(doc_id % 900 + 100 AS STRING) || ',00' WHEN 1 THEN lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') || '/' || lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0') || '/' || CAST(2019 + doc_id % 6 AS STRING) ELSE '  Acme Corp ' || CAST(doc_id % 7 AS STRING) || '  ' END"
      val low = "lower(trim(etext))"
      val amtKeep = d.rr(low, "'[^Vdt .,]+'", "''")
      val amtNorm = s"replace(replace($amtKeep, '.', ''), ',', '.')"
      val amtOut = s"CASE WHEN try_cast($amtNorm AS DOUBLE) IS NOT NULL THEN CAST(try_cast($amtNorm AS DOUBLE) AS STRING) ELSE $amtNorm END"
      val dateOut = s"coalesce(${d.d2iso(low, "M/d/yyyy", "%m/%d/%Y")}, $low)"
      s"""SELECT doc_id, etype, etext,
         | CASE WHEN etype = 'AMOUNT' THEN $amtOut
         |      WHEN etype = 'START_DATE' THEN $dateOut
         |      ELSE $low END AS normalized
         | FROM (SELECT doc_id, $etype AS etype, $etext AS etext FROM documents) t ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // P18 — year extraction with the 2999 placeholder rule
    "p18_year" -> q { d =>
      val y = s"regexp_extract(ctext, $PatYear, 0)"
      s"SELECT doc_id, CASE WHEN $y = '' THEN '2999' ELSE $y END AS start_year ${src()} ORDER BY doc_id"
    },

    // P22 — table-cell text cleanup chain
    "p22_cellclean" -> q { d =>
      val cell = "('Intro' || CASE WHEN doc_id % 3 = 0 THEN ' . . . . ' ELSE '.....' END || CAST(doc_id % 100 AS STRING) || chr(160) || 'end')"
      val c1 = d.rr(cell, "'(\\s\\.){2,}'", "''")
      val c2 = d.rr(c1, "'\\.{2,}'", "''")
      val c3 = s"replace($c2, chr(160), ' ')"
      s"SELECT doc_id, $c3 AS cleaned FROM documents ORDER BY doc_id"
    },

    // P25 — lineage op hash
    "p25_ophash" -> q { d =>
      s"""SELECT doc_id, md5('2025-08-19T16:53:51' || 'rename' || '/in/' || CAST(doc_id AS STRING) || '.pdf' || '/out/' || CAST(doc_id AS STRING) || '.pdf') AS op_hash
         | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // P26 — boilerplate text/link densities over planted html
    "p26_boiler" -> q { d =>
      val html = """(CASE CAST(doc_id % 3 AS INT)
        | WHEN 0 THEN '<div><a href="/a">Home</a> <a href="/b">About Pages</a></div>'
        | WHEN 1 THEN '<p>' || substr(text, 1, 80) || '</p>'
        | ELSE '<div>' || substr(text, 1, 40) || ' <a href="/x">more</a></div>' END)""".stripMargin.replace("\n", " ")
      val stripped = d.rr("html", "'<[^>]+>'", "''")
      val linkTexts = s"regexp_extract_all(html, '(?i)<a[^>]*>(.*?)</a>', 1)"
      val linkChars = d.lsum(d.lmap(linkTexts, "x -> length(x)"))
      s"""SELECT doc_id,
         | round(length($stripped) * 1e0 / length(html), 4) AS text_density,
         | round($linkChars * 1e0 / nullif(length($stripped), 0), 4) AS link_density,
         | CASE WHEN length($stripped) * 1e0 / length(html) >= 0.35
         |       AND $linkChars * 1e0 / nullif(length($stripped), 0) <= 0.33
         |      THEN 1 ELSE 0 END AS is_content
         | FROM (SELECT doc_id, $html AS html FROM (SELECT doc_id, text FROM documents) s) t ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // P19 — supplier normalize over the supplier dimension
    "p19_supplier" -> q { d =>
      val norm = d.rr("replace(replace(s_name, ' ', '_'), '-', '_')", "'[^A-Za-z0-9_]'", "''")
      s"SELECT s_suppkey, substr($norm, 1, 50) AS supplier_dir FROM supplier ORDER BY s_suppkey"
    },

    // P20 — canonical filename compose
    "p20_filename" -> q { d =>
      val sup = d.rr("replace(replace(s_name, ' ', '_'), '-', '_')", "'[^A-Za-z0-9_]'", "''")
      val fn = s"substr($sup, 1, 50) || '_MSA_' || CAST(2020 + s_suppkey % 6 AS STRING) || '_' || CAST(2022 + s_suppkey % 6 AS STRING) || '_K' || CAST(s_suppkey AS STRING) || '.pdf'"
      val clean = d.rr(s"($fn)", "'[^A-Za-z0-9._\\-]'", "''")
      s"SELECT s_suppkey, $clean AS filename FROM supplier ORDER BY s_suppkey"
    },

    // P27 — local analyzer fallback (services/contract_analyzer.py:213-267):
    // first-match-wins over 3 contract-id patterns + 2 title patterns,
    // then post-processing (strip dots/space, truncate 200 + '...').
    "p27_local_analysis" -> q { d =>
      val atext = """(CASE CAST(doc_id % 3 AS INT)
        | WHEN 0 THEN 'This Agreement is entered into between Alpha Holdings and Beta Partners. More text.'
        | WHEN 1 THEN 'Contract No. : AB-2024-0042 applies here. Title: Services Deal' || chr(10) || 'next line'
        | ELSE 'nothing to find here' END || ' ' || text)"""
        .stripMargin.replace("\n", " ")
      def ne(x: String) = s"nullif($x, '')"
      val id1 = "regexp_extract(atext, '(?i)Contract\\s+(?:No\\.?|Number|#)\\s*[:.]?\\s*([A-Z0-9\\-_]+)', 1)"
      val id2 = "regexp_extract(atext, '(?i)Agreement\\s+(?:No\\.?|Number|#)\\s*[:.]?\\s*([A-Z0-9\\-_]+)', 1)"
      val id3 = "regexp_extract(atext, '(?i)([A-Z]{2,3}-[0-9]{4}-[0-9]{3,4})', 1)"
      val n1 = "regexp_extract(atext, '(?i)(?:This\\s+)?(?:Agreement|Contract)\\s+(?:is\\s+)?(?:entered\\s+into|made)\\s+(?:by\\s+and\\s+between|between)\\s+(.+?)(?:\\s+and\\s+|\\.)', 1)"
      val n2 = "regexp_extract(atext, '(?i)Title[:\\s]+(.+?)(?:\\n|\\.)', 1)"
      val cid = s"coalesce(${ne(id1)}, ${ne(id2)}, ${ne(id3)})"
      val cidClean =
        if (d.isSpark) s"trim(trim(BOTH '.' FROM trim($cid)))"
        else s"trim(trim(trim($cid), '.'))"
      val name = s"trim(coalesce(${ne(n1)}, ${ne(n2)}))"
      val nameTrunc = s"CASE WHEN length($name) > 200 THEN substr($name, 1, 200) || '...' ELSE $name END"
      s"""SELECT doc_id, $cidClean AS contract_id, $nameTrunc AS contract_name
         |FROM (SELECT doc_id, $atext AS atext FROM documents) t ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // P23 — extraction confidence (contract_parser.py:544-577;
    // Rules.confidence): the 6-check mean over the planted fields. Every
    // input is derived from ctext with the SAME patterns the individual
    // p-queries gate (title P1, number P2, parties P6, dates P5, heading
    // count, the 23 clause headers), so the formula is value-exact against
    // DuckDB across all planted field-presence combinations.
    "p23_confidence" -> q { d =>
      val title = s"regexp_extract(ctext, $PatTitle, 1)"
      val num = s"regexp_extract(ctext, $PatNum, 1)"
      val client = s"trim(regexp_extract(ctext, ${patClient(d)}, 1))"
      val vendor = s"trim(regexp_extract(ctext, ${patVendor(d)}, 1))"
      val dmyAll = s"regexp_extract_all(ctext, $PatDmy, 0)"
      val nDmy = d.size(d.lfilter(dmyAll, s"x -> ${d.dok("x", "d/M/yyyy", "%d/%m/%Y")}"))
      val ymdOk = d.dok(s"regexp_extract(ctext, $PatYmd, 0)", "y-M-d", "%Y-%m-%d")
      val nSections = d.size(s"regexp_extract_all(ctext, '(?m)^#{1,2}\\s+.+$$', 0)")
      val nClauses = ClauseHeaders
        .map(h => s"CASE WHEN lower(ctext) LIKE '%$h%' THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      val score =
        s"""(CASE WHEN $title <> '' THEN 1e0 ELSE 0e0 END
           | + CASE WHEN $num <> '' THEN 1e0 ELSE 0e0 END
           | + CASE WHEN $client <> '' AND $vendor <> '' THEN 1e0 ELSE 0e0 END
           | + CASE WHEN $nDmy > 0 OR $ymdOk THEN 1e0 ELSE 0e0 END
           | + CASE WHEN $nSections > 0 THEN least($nSections / 5e0, 1e0) ELSE 0e0 END
           | + CASE WHEN $nClauses > 0 THEN least($nClauses / 3e0, 1e0) ELSE 0e0 END)"""
          .stripMargin.replace("\n", " ")
      s"""SELECT doc_id, $nClauses AS n_clauses,
         | round($score / 6e0, 6) AS confidence
         | ${src()} ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // P15 twin — FIXED-WIDTH chunking, value-exact in both dialects
    // (sequence/range + substr). The sentence-boundary variant (rfind('.'))
    // stays fold-shaped and test-gated (Rules.chunkText, x04); this twin
    // gives the chunk generator an oracle the way j02/j06 twin each other.
    "p15_chunks_fixed" -> q { d =>
      if (d.isSpark)
        s"""SELECT doc_id, CAST((i - 1) * 128 AS INT) AS start,
           | substr(text, (i - 1) * 128 + 1, 128) AS chunk
           |FROM (SELECT doc_id, text FROM documents WHERE length(text) > 0) t
           |LATERAL VIEW explode(sequence(1, CAST(ceil(length(text) / 128e0) AS INT))) sv AS i
           |ORDER BY doc_id, start""".stripMargin.replace("\n", " ")
      else
        s"""SELECT doc_id, CAST((i - 1) * 128 AS INT) AS start,
           | substr(text, CAST((i - 1) * 128 + 1 AS INT), 128) AS chunk
           |FROM (SELECT doc_id, text,
           |  unnest(range(1, CAST(ceil(length(text) / 128e0) AS BIGINT) + 1)) AS i
           |  FROM documents WHERE length(text) > 0) t
           |ORDER BY doc_id, start""".stripMargin.replace("\n", " ")
    },

    // P21 — rename-vs-translate decision over planted filenames
    "p21_optype" -> q { d =>
      val re = "'^[\\x00-\\x7f]*$'"
      val pred = if (d.isSpark) s"fname RLIKE $re" else s"regexp_matches(fname, $re)"
      s"SELECT doc_id, CASE WHEN NOT ($pred) THEN 'translate' ELSE 'rename' END AS op_type ${src()} ORDER BY doc_id"
    }
  )

  /** DuckDB oracle for x04_chunks — the SENTENCE-BOUNDARY chunker
    * (Rules.chunkText, maxLength 128) re-derived as a recursive CTE, so
    * the Scala while-loop (data-dependent chunk boundaries: prefer the
    * last '.' strictly inside the window) is hash-compared value-exact.
    * Per step at 0-based offset s: end0 = s+128; if end0 < len, the
    * qualifying window is 0-based indices (s, end0-1] = substr(text,
    * s+2, 127); a last '.' at 1-based window position p means the break
    * lands at e = s + 129 - strpos(reverse(win), '.'); else e = end0;
    * when end0 >= len, e = len. Parity notes: the corpus text is pure
    * ASCII (checked), so Java UTF-16 indexing == DuckDB character
    * indexing; `lastIndexOf('.', end-1) > start` excludes a period AT
    * s, which the (s, end0-1] window encodes exactly. */
  val X04OracleDuck: String =
    """WITH RECURSIVE ch AS (
      |  SELECT doc_id, coalesce(text, '') AS text, CAST(0 AS BIGINT) AS start,
      |         CASE WHEN 128 >= length(text) THEN CAST(length(text) AS BIGINT)
      |              WHEN strpos(reverse(substr(text, 2, 127)), '.') > 0
      |              THEN CAST(129 - strpos(reverse(substr(text, 2, 127)), '.') AS BIGINT)
      |              ELSE CAST(128 AS BIGINT) END AS e
      |  FROM documents WHERE length(coalesce(text, '')) > 0
      |  UNION ALL
      |  SELECT doc_id, text, e AS start,
      |         CASE WHEN e + 128 >= length(text) THEN CAST(length(text) AS BIGINT)
      |              WHEN strpos(reverse(substr(text, CAST(e + 2 AS INT), 127)), '.') > 0
      |              THEN e + 129 - strpos(reverse(substr(text, CAST(e + 2 AS INT), 127)), '.')
      |              ELSE e + 128 END AS e
      |  FROM ch WHERE e < length(text))
      |SELECT doc_id, CAST(start AS INT) AS start,
      |       substr(text, CAST(start + 1 AS INT), CAST(e - start AS INT)) AS chunk
      |FROM ch ORDER BY doc_id, start"""
      .stripMargin.replace("\n", " ").replaceAll("\\s+", " ").trim

  /** Planted entity set for a11_entity_dedup: seven rows per document with
    * engineered duplicate groups, so the A1 keep-highest dedup has real
    * work on every doc —
    *  - two AMOUNT spellings (case + padding) where the HIGHER-confidence
    *    later occurrence must win;
    *  - three START_DATE spellings (padded mdy, whitespace-wrapped mdy,
    *    iso ymd) that normalize to the SAME date: the confidence tie
    *    resolves by start_pos, and the iso row must MERGE into the group
    *    (cross-format normalization inside the dedup key);
    *  - two CONTRACT_ID casings tied on confidence AND position: the
    *    text-asc tiebreak picks the uppercase form.
    * Rendered per dialect; both engines build the identical row set. */
  def a11EntitySet(d: D): String = {
    val amt = "CAST(doc_id % 900 + 100 AS STRING)"
    val mdy = "lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') || '/' || lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0') || '/' || CAST(2019 + doc_id % 6 AS STRING)"
    val ymd = "CAST(2019 + doc_id % 6 AS STRING) || '-' || lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') || '-' || lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0')"
    val num = "lpad(CAST(doc_id * 7 % 9999 AS STRING), 4, '0')"
    val rows = Seq(
      (s"'R$$ ' || $amt || ',00'", "AMOUNT", 10, "0.85"),
      (s"'r$$ ' || $amt || ',00 '", "AMOUNT", 40, "0.9"),
      (mdy, "START_DATE", 5, "0.85"),
      (s"' ' || $mdy || ' '", "START_DATE", 60, "0.85"),
      (ymd, "START_DATE", 70, "0.8"),
      (s"'K-' || $num", "CONTRACT_ID", 20, "0.8"),
      (s"'k-' || $num", "CONTRACT_ID", 20, "0.8"))
    rows.map { case (t, ty, pos, conf) =>
      s"SELECT doc_id, $t AS text, '$ty' AS entity_type, " +
        s"CAST($pos AS INT) AS start_pos, CAST($pos + length($t) AS INT) AS end_pos, " +
        s"CAST($conf AS DOUBLE) AS confidence FROM documents"
    }.mkString(" UNION ALL ")
  }

  /** DuckDB oracle for a11_entity_dedup: the same planted entity set, the
    * normalization twin as the dedup key (P17 semantics: dates to ISO via
    * both accepted formats, otherwise lower(trim) — the amount rows are
    * identical post-trim so the grouping coincides with the digit-strip
    * mangle), and the A1 window (confidence DESC, start_pos, text). The
    * Spark side runs the REAL Entities.dedupWindow operator. */
  val A11OracleDuck: String = {
    val d = Dialect.Duck
    val low = "lower(trim(text))"
    val dkey = s"coalesce(${d.d2iso(low, "M/d/yyyy", "%m/%d/%Y")}, ${d.d2iso(low, "yyyy-M-d", "%Y-%m-%d")}, $low)"
    s"""WITH e AS (${a11EntitySet(d)}),
       |n AS (SELECT *, CASE WHEN entity_type = 'START_DATE' THEN $dkey ELSE $low END AS nkey FROM e),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id, nkey, entity_type
       |        ORDER BY confidence DESC, start_pos, text) AS rn FROM n)
       |SELECT doc_id, text, entity_type, start_pos, end_pos, confidence
       |FROM r WHERE rn = 1 ORDER BY doc_id, entity_type, start_pos"""
      .stripMargin.replace("\n", " ")
  }
}
