package graft.queries

import graft.queries.Dialect.{Ctext, Fname}

/** Source/sink-shaped operators (SURVEY §2.1) and the remaining agg/sort/
  * incremental items: the flagship flattened-contract export (SNK4 CSV
  * shape), JSONL rendering (SNK5), exploded-party counts (A2), top-1 pick
  * (O4), memo-cache reuse anti-join (S2), and JSON-source parsing (SRC6). */
object SinkQueries {

  private def q(body: D => String): (String, String) =
    (body(Dialect.Spark), body(Dialect.Duck))

  private def src(): String =
    s"FROM (SELECT doc_id, $Ctext AS ctext, $Fname AS fname, text, lang, source, n_chars FROM documents) t"

  val all: Map[String, (String, String)] = Map(

    // SNK4 — flagship: one wide flattened contract row per doc (the CSV
    // export shape: fixed columns, list fields joined '; ', None -> '').
    // Composes P1+P2+P3+P7+P8+P18 in a single projection — one scan pass.
    "c01_contract_flat" -> q { d =>
      val title = "regexp_extract(ctext, '(?m)^#{1,2}\\s+(.+)$', 1)"
      val num = "regexp_extract(ctext, '(?i)(?:contract\\s+number|número\\s+do\\s+contrato|ref|reference)[\\s:]*([A-Z0-9\\-_/]+)', 1)"
      val cur = "regexp_extract(ctext, '(?i)(R\\$|US\\$|USD|BRL|EUR|€|£)', 1)"
      val emailsArr = "regexp_extract_all(ctext, '\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b', 0)"
      val emails = if (d.isSpark) s"array_join(array_sort(array_distinct($emailsArr)), '; ')"
                   else s"coalesce(array_to_string(list_sort(list_distinct($emailsArr)), '; '), '')"
      val year = "regexp_extract(ctext, '\\b(19|20)\\d{2}\\b', 0)"
      s"""SELECT doc_id,
         | $title AS contract_name,
         | CASE WHEN $num = '' THEN 'N/A' ELSE $num END AS contract_number,
         | CASE WHEN $cur = '' THEN 'USD' ELSE $cur END AS currency,
         | CASE
         |  WHEN lower(ctext) LIKE '%master service agreement%' OR lower(ctext) LIKE '%msa%' THEN 'MSA'
         |  WHEN lower(ctext) LIKE '%local service agreement%' OR lower(ctext) LIKE '%lsa%' THEN 'LSA'
         |  WHEN lower(ctext) LIKE '%statement of work%' OR lower(ctext) LIKE '%sow%' THEN 'SOW'
         |  WHEN lower(ctext) LIKE '%project work order%' OR lower(ctext) LIKE '%pwo%' THEN 'PWO'
         |  WHEN lower(ctext) LIKE '%change request%' OR lower(ctext) LIKE '%cr%' THEN 'CR'
         |  ELSE 'CNF' END AS contract_type,
         | $emails AS emails,
         | CASE WHEN $year = '' THEN '2999' ELSE $year END AS start_year
         | ${src()} ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // SNK5 — JSONL training export: deterministic JSON rendering (manual
    // concat: engine to_json key ordering differs, so the operator renders
    // its own line — which is also what a stable exporter must do).
    "c02_jsonl_export" -> q { d =>
      val num = "regexp_extract(ctext, '(?i)(?:contract\\s+number|número\\s+do\\s+contrato|ref|reference)[\\s:]*([A-Z0-9\\-_/]+)', 1)"
      s"""SELECT doc_id,
         | '{"text": "' || replace(substr(ctext, 1, 40), chr(10), ' ') || '", "labels": {"contract_id": "'
         |   || $num || '"}, "metadata": {"lang": "' || lang || '", "source": "' || source || '"}}' AS jsonl
         | ${src()} ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // A2 (exploded list variant) — party counts after exploding the
    // per-doc party array (openai_contract_explorer.py:385-402)
    "a02b_party_counts" -> q { d =>
      val parties = "CASE WHEN doc_id % 16 <> 2 THEN 'Acme Corp;Beta Ltd' ELSE 'Acme Corp' END"
      if (d.isSpark)
        s"""SELECT party, count(*) AS n FROM (
           | SELECT explode(split($parties, ';')) AS party FROM documents) t
           |GROUP BY party ORDER BY n DESC, party""".stripMargin.replace("\n", " ")
      else
        s"""SELECT party, count(*) AS n FROM (
           | SELECT unnest(string_split($parties, ';')) AS party FROM documents) t
           |GROUP BY party ORDER BY n DESC, party""".stripMargin.replace("\n", " ")
    },

    // O4 — top-1 pick by size (smallest-file selection)
    "o04_smallest" -> q { d =>
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice ASC, p_partkey ASC LIMIT 1""".stripMargin.replace("\n", " ")
    },

    // S2 — memo-cache reuse: anti-join pending work against a results
    // table keyed by content hash (translator.py:42-46)
    "s02_memo_antijoin" -> q { d =>
      val h = d.h32("text")
      if (d.isSpark)
        s"""SELECT doc_id FROM (SELECT doc_id, $h AS key FROM documents) w
           |LEFT ANTI JOIN (SELECT DISTINCT $h AS done_key FROM documents WHERE doc_id % 3 = 0) memo
           |ON w.key = memo.done_key ORDER BY doc_id""".stripMargin.replace("\n", " ")
      else
        s"""SELECT doc_id FROM (SELECT doc_id, $h AS key FROM documents) w
           |WHERE NOT EXISTS (SELECT 1 FROM (SELECT DISTINCT $h AS done_key FROM documents WHERE doc_id % 3 = 0) memo
           |                  WHERE w.key = memo.done_key) ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // SRC6 — JSON source parsing: planted JSON docs -> typed fields
    "c03_json_source" -> q { d =>
      val js = """('{"kind": "' || (CASE WHEN doc_id % 2 = 0 THEN 'heading' ELSE 'paragraph' END) || '", "text": "block ' || CAST(doc_id AS STRING) || '", "offset": ' || CAST(doc_id % 40 AS STRING) || '}')"""
      if (d.isSpark)
        s"""SELECT doc_id, get_json_object(js, '$$.kind') AS kind,
           | get_json_object(js, '$$.text') AS btext,
           | CAST(get_json_object(js, '$$.offset') AS INT) AS offset
           |FROM (SELECT doc_id, $js AS js FROM documents) t ORDER BY doc_id""".stripMargin.replace("\n", " ")
      else
        s"""SELECT doc_id, json_extract_string(js, '$$.kind') AS kind,
           | json_extract_string(js, '$$.text') AS btext,
           | CAST(json_extract(js, '$$.offset') AS INT) AS offset
           |FROM (SELECT doc_id, $js AS js FROM documents) t ORDER BY doc_id""".stripMargin.replace("\n", " ")
    }
  )
}
