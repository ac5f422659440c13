package graft.queries

/** Validation-rule queries (reference: src/pappermate/validation/schema.py
  * :169-260, pinned by tests/validation/test_schema_validation.py) plus the
  * 2-D bbox spatial argmax join (services/table_processor_fixed.py:237-294).
  *
  * Contract/document/hierarchy fields are PLANTED deterministically from
  * doc_id (the engine's own extraction output is gated separately by
  * x01/x02 and the golden suite) so every rule branch — including the
  * error-free path — is exercised and the DuckDB oracle reproduces the
  * exact error strings. Error messages and their order are verbatim from
  * `_validate_business_rules` / `_validate_document_rules` /
  * `_validate_hierarchy_rules`.
  */
object ValidationQueries {

  private def q(body: D => String): (String, String) =
    (body(Dialect.Spark), body(Dialect.Duck))

  private def err(cond: String, msg: String): String =
    s"CASE WHEN $cond THEN '$msg' ELSE '' END"

  /** Planted contract fields shared by v02 and v06 (every rule branch
    * exercised, incl. the error-free path). */
  private val ContractFields: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 7 AS INT) WHEN 0 THEN 'N/A' WHEN 1 THEN '' ELSE 'Contract ' || CAST(doc_id AS STRING) END AS contract_name,
      |  CASE WHEN doc_id % 5 = 0 THEN 'N/A' ELSE 'K-' || CAST(doc_id AS STRING) END AS contract_number,
      |  CASE WHEN doc_id % 4 = 0 THEN 'N/A' ELSE 'Acme Corp' END AS client_name,
      |  CASE WHEN doc_id % 6 = 0 THEN '' ELSE 'Beta Ltd' END AS vendor_name,
      |  CASE WHEN doc_id % 13 = 2 THEN NULL ELSE '2021-06-01' END AS effective_date,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '2020-01-01' WHEN 1 THEN '2021-06-01' ELSE '2023-01-01' END AS expiration_date,
      |  CASE CAST(doc_id % 8 AS INT) WHEN 0 THEN -5e0 WHEN 1 THEN 0e0 WHEN 2 THEN NULL ELSE 1e2 END AS total_value,
      |  CASE WHEN doc_id % 9 = 0 THEN '' ELSE 'USD' END AS currency,
      |  CASE WHEN doc_id % 19 = 9 THEN 0 ELSE 1 END AS has_entities,
      |  CASE WHEN doc_id % 11 = 3 THEN 0 ELSE 1 END AS ent_sections,
      |  CASE WHEN doc_id % 13 = 5 THEN 0 ELSE 1 END AS ent_extracted,
      |  CASE WHEN doc_id % 17 = 7 THEN 0 ELSE 1 END AS ent_parsing
      |FROM documents""".stripMargin.replace("\n", " ")

  /** The ten business-rule checks of `_validate_business_rules`, in rule
    * order, each rendering '' or the verbatim reference message. */
  private val ContractChecks: Seq[String] = Seq(
    err("coalesce(contract_name, '') = '' OR contract_name = 'N/A'",
      "Contract must have a valid name"),
    err("coalesce(contract_number, '') = '' OR contract_number = 'N/A'",
      "Contract must have a valid contract number"),
    err("coalesce(client_name, '') = '' OR client_name = 'N/A'",
      "Contract must have a valid client name"),
    err("coalesce(vendor_name, '') = '' OR vendor_name = 'N/A'",
      "Contract must have a valid vendor name"),
    err("effective_date IS NOT NULL AND expiration_date IS NOT NULL AND effective_date >= expiration_date",
      "Effective date must be before expiration date"),
    err("total_value IS NOT NULL AND total_value <= 0",
      "Contract total value must be positive"),
    err("total_value IS NOT NULL AND coalesce(currency, '') = ''",
      "Contract must have currency when value is specified"),
    err("has_entities = 1 AND ent_sections = 0",
      "Contract entities must include sections"),
    err("has_entities = 1 AND ent_extracted = 0",
      "Contract entities must include extracted entities"),
    err("has_entities = 1 AND ent_parsing = 0",
      "Contract entities must include parsing metadata"))

  val all: Map[String, (String, String)] = Map(

    // V2 — contract business rules (schema.py:169-210): planted contract
    // rows exercising every branch; errors rendered '; '-joined in rule order.
    "v02_validate" -> q { d =>
      val fields = ContractFields
      val checks = ContractChecks
      s"""SELECT doc_id, ${d.joinNonEmpty(checks, "; ")} AS errors,
         | CASE WHEN ${checks.map(c => s"$c = ''").mkString(" AND ")} THEN 1 ELSE 0 END AS is_valid
         | FROM ($fields) t ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // V6 — per-contract validation summary (schema.py:329-359
    // get_validation_summary): error count + flags + planted parse stats.
    // The reference's validation_timestamp (wall clock) is dropped.
    "v06_validation_summary" -> q { d =>
      val checks = ContractChecks
      val errCount =
        if (d.isSpark) s"size(filter(array(${checks.mkString(", ")}), x -> x <> ''))"
        else s"len(list_filter([${checks.mkString(", ")}], x -> x <> ''))"
      val ctype = """CASE CAST(doc_id % 6 AS INT) WHEN 0 THEN 'msa' WHEN 1 THEN 'lsa'
        | WHEN 2 THEN 'sow' WHEN 3 THEN 'pwo' WHEN 4 THEN 'cr' ELSE 'cnf' END"""
        .stripMargin.replace("\n", " ")
      s"""SELECT doc_id,
         | CASE WHEN $errCount = 0 THEN 1 ELSE 0 END AS is_valid,
         | $errCount AS error_count,
         | ${d.joinNonEmpty(checks, "; ")} AS errors,
         | round((doc_id % 100) * 1e0 / 100, 2) AS confidence_score,
         | CAST(doc_id % 8 AS INT) AS extracted_clauses,
         | CAST(doc_id % 6 AS INT) AS section_count,
         | $ctype AS contract_type,
         | CASE WHEN effective_date IS NOT NULL OR expiration_date IS NOT NULL THEN 1 ELSE 0 END AS has_dates,
         | CASE WHEN total_value IS NOT NULL THEN 1 ELSE 0 END AS has_value
         | FROM ($ContractFields) t ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // V3 — document business rules (schema.py:225-246)
    "v03_validate_document" -> q { d =>
      val fields =
        """SELECT doc_id,
          |  CASE WHEN doc_id % 7 = 0 THEN '' ELSE 'doc_' || CAST(doc_id AS STRING) || '.pdf' END AS filename,
          |  CASE WHEN doc_id % 5 = 0 THEN '' ELSE '/in/doc_' || CAST(doc_id AS STRING) || '.pdf' END AS file_path,
          |  CASE WHEN doc_id % 6 = 0 THEN 0 ELSE n_chars + 100 END AS file_size,
          |  CASE WHEN doc_id % 4 = 0 THEN 'error' ELSE 'converted' END AS status,
          |  CASE WHEN doc_id % 8 < 4 THEN '' ELSE 'boom' END AS error_message,
          |  substr(text, 1, 50) AS content
          |FROM documents""".stripMargin.replace("\n", " ")
      val checks = Seq(
        err("filename = ''", "Document must have a valid filename"),
        err("file_path = ''", "Document must have a valid file path"),
        err("file_size <= 0", "Document must have a positive file size"),
        err("status = 'error' AND error_message = ''",
          "Document with error status must have an error message"),
        err("length(content) > 0 AND length(content) > file_size",
          "Document content length cannot exceed file size"))
      s"""SELECT doc_id, ${d.joinNonEmpty(checks, "; ")} AS errors
         | FROM ($fields) t ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // J3 — hierarchy business rules (schema.py:248-260; fixture relations
    // scripts/sample_contracts.py:113-147): hierarchies of 10 contracts,
    // root-membership via a per-group aggregate (one hash agg, no window).
    "j03_hierarchy_validate" -> q { d =>
      val members =
        """SELECT CAST(doc_id - doc_id % 10 AS BIGINT) AS hierarchy_id,
          |       'C' || CAST(doc_id AS STRING) AS contract_id
          |FROM documents""".stripMargin.replace("\n", " ")
      val groups =
        s"""SELECT hierarchy_id,
           |  CASE WHEN hierarchy_id % 7 = 0 THEN '' ELSE 'H-' || CAST(hierarchy_id AS STRING) END AS name,
           |  CASE WHEN hierarchy_id % 11 = 0 THEN ''
           |       WHEN hierarchy_id % 5 = 0 THEN 'CX-missing'
           |       ELSE 'C' || CAST(hierarchy_id AS STRING) END AS root_contract_id,
           |  CASE WHEN hierarchy_id % 3 = 0 THEN 0 ELSE 1 END AS is_valid,
           |  count(*) AS n_contracts
           |FROM ($members) m GROUP BY hierarchy_id""".stripMargin.replace("\n", " ")
      val joined =
        s"""SELECT g.hierarchy_id, g.name, g.root_contract_id, g.is_valid, g.n_contracts,
           |  max(CASE WHEN m.contract_id = g.root_contract_id THEN 1 ELSE 0 END) AS root_in_members
           |FROM ($groups) g JOIN ($members) m ON g.hierarchy_id = m.hierarchy_id
           |GROUP BY g.hierarchy_id, g.name, g.root_contract_id, g.is_valid, g.n_contracts"""
          .stripMargin.replace("\n", " ")
      val checks = Seq(
        err("name = ''", "Contract hierarchy must have a valid name"),
        err("root_contract_id = ''", "Contract hierarchy must have a root contract ID"),
        err("n_contracts > 0 AND root_in_members = 0",
          "Root contract ID must exist in contracts list"),
        // planted hierarchies carry no validation_errors payload, so every
        // is_valid=0 group trips the must-have-messages rule
        err("is_valid = 0", "Invalid hierarchy must have validation error messages"))
      s"""SELECT hierarchy_id, n_contracts, ${d.joinNonEmpty(checks, "; ")} AS errors
         | FROM ($joined) t ORDER BY hierarchy_id""".stripMargin.replace("\n", " ")
    },

    // V5 — JSON structural validation (schema.py:288-328 simplified
    // validator, pinned by tests/validation/test_schema_validation.py:
    // 400-515): malformed JSON short-circuits (the reference's
    // json.JSONDecodeError early return; exception detail dropped — it is
    // Python-runtime text), then required-field presence and a numeric
    // type constraint with the reference's message shapes. Planted JSON
    // exercises every branch.
    "v05_json_schema_check" -> q { d =>
      val j =
        """(CASE WHEN doc_id % 11 = 3 THEN '{broken'
          | ELSE '{"contract_name": "C-' || CAST(doc_id AS STRING) || '"'
          |   || CASE WHEN doc_id % 5 = 0 THEN '' ELSE ', "contract_number": "K-' || CAST(doc_id AS STRING) || '"' END
          |   || ', "total_value": '
          |   || CASE WHEN doc_id % 7 = 0 THEN '"abc"' ELSE CAST(doc_id % 1000 AS STRING) || '.5' END
          |   || '}' END)""".stripMargin.replace("\n", " ")
      val invalid =
        if (d.isSpark) "get_json_object(j, '$') IS NULL"
        else "NOT json_valid(j)"
      def jget(path: String): String =
        if (d.isSpark) s"get_json_object(j, '$$.$path')"
        else s"json_extract_string(j, '$$.$path')"
      // messages contain single quotes; escapedStringLiterals-mode Spark
      // keeps '' literal, so the quote is composed via chr(39) (both engines)
      def qmsg(cond: String, m: String): String = {
        val lit = "'" + m.replace("'", "' || chr(39) || '") + "'"
        s"CASE WHEN $cond THEN $lit ELSE '' END"
      }
      val checks = Seq(
        qmsg(s"${jget("contract_name")} IS NULL", "Required field 'contract_name' is missing"),
        qmsg(s"${jget("contract_number")} IS NULL", "Required field 'contract_number' is missing"),
        qmsg(s"${jget("total_value")} IS NOT NULL AND try_cast(${jget("total_value")} AS DOUBLE) IS NULL",
          "Property 'total_value': Expected number type, got str"))
      s"""SELECT doc_id,
         | CASE WHEN $invalid THEN 'Invalid JSON format'
         |      ELSE ${d.joinNonEmpty(checks, "; ")} END AS errors
         | FROM (SELECT doc_id, $j AS j FROM documents) t ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")
    },

    // J6 — 2-D bbox intersection-area argmax join: text lines x table cells
    // on a 4x4 grid, area = x-overlap * y-overlap, argmax per line with
    // cell_id-asc tiebreak, zero-intersection lines dropped — the full
    // geometry of table_processor_fixed.py:277-283 (j02 keeps the 1-D
    // reduction for continuity). Spark side: integer-encoded argmax
    // m = area * 16 + (15 - cell_id) — a plain int max is HASH-aggregable
    // (partial+final HashAggregate), where max(struct) forced a
    // per-partition sort-aggregate.
    "j06_bbox_argmax" -> q { d =>
      val lines =
        """SELECT l_orderkey, l_linenumber,
          |  CAST(l_partkey % 80 AS INT) AS x0,
          |  CAST(l_partkey % 80 + l_suppkey % 20 + 5 AS INT) AS x1,
          |  CAST(l_suppkey % 60 AS INT) AS y0,
          |  CAST(l_suppkey % 60 + l_linenumber % 12 + 4 AS INT) AS y1
          |FROM lineitem""".stripMargin.replace("\n", " ")
      val cells =
        """SELECT o_orderkey AS c_orderkey, i * 4 + j AS cell_id,
          |  i * 25 AS cx0, i * 25 + 25 AS cx1, j * 20 AS cy0, j * 20 + 20 AS cy1
          |FROM orders, (VALUES (0), (1), (2), (3)) AS ci(i),
          |             (VALUES (0), (1), (2), (3)) AS cj(j)"""
          .stripMargin.replace("\n", " ")
      val area = """greatest(0, least(l.x1, c.cx1) - greatest(l.x0, c.cx0))
        | * greatest(0, least(l.y1, c.cy1) - greatest(l.y0, c.cy0))"""
        .stripMargin.replace("\n", " ")
      if (d.isSpark)
        s"""WITH lines AS ($lines), cells AS ($cells),
           |best AS (
           |  SELECT l.l_orderkey, l.l_linenumber, max(($area) * 16 + 15 - c.cell_id) AS m
           |  FROM lines l JOIN cells c ON l.l_orderkey = c.c_orderkey
           |  GROUP BY l.l_orderkey, l.l_linenumber)
           |SELECT l_orderkey, l_linenumber, CAST(15 - m % 16 AS INT) AS cell_id,
           |       CAST(m DIV 16 AS INT) AS area
           |FROM best WHERE m DIV 16 > 0
           |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", " ")
      else
        s"""WITH lines AS ($lines), cells AS ($cells),
           |scored AS (
           |  SELECT l.l_orderkey, l.l_linenumber, c.cell_id, $area AS area,
           |         row_number() OVER (PARTITION BY l.l_orderkey, l.l_linenumber
           |                            ORDER BY $area DESC, c.cell_id) AS rn
           |  FROM lines l JOIN cells c ON l.l_orderkey = c.c_orderkey)
           |SELECT l_orderkey, l_linenumber, cell_id, area
           |FROM scored WHERE rn = 1 AND area > 0
           |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", " ")
    }
  )
}
