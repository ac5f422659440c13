package graft.queries

/** Shared SQL between the Spark implementation and the DuckDB oracle.
  *
  * Scalar-extraction queries are written ONCE as a `D => String` body;
  * rendering with `D.spark`/`D.duck` yields the engine dialect. Everything
  * not behind a helper is written in the COMMON subset of both dialects
  * (||, chr, lpad, CASE, md5, LIKE, try_cast, lambdas `x -> ...`,
  * regexp_extract[_all] with explicit group idx) — validated by probe runs
  * against both engines:
  *  - regexp semantics match (Java regex vs RE2) for every pattern used,
  *    including the reference quirks ('prefers X' -> 'ers');
  *  - lookaheads are Spark-only; the oracle uses the consuming rewrite
  *    `(?:...|$)` which yields the same group-1 for first-match extraction;
  *  - hex->int: conv(hex,16,10) == ('0x'||hex)::UBIGINT (probed equal).
  */
final case class D(isSpark: Boolean) {
  /** global regexp_replace */
  def rr(x: String, p: String, r: String): String =
    if (isSpark) s"regexp_replace($x, $p, $r)"
    else s"regexp_replace($x, $p, $r, 'g')"
  /** array length */
  def size(x: String): String = if (isSpark) s"size($x)" else s"len($x)"
  /** 0-based array element, null out-of-bounds (Spark ANSI needs try_) */
  def idx(a: String, i: Int): String =
    if (isSpark) s"try_element_at($a, ${i + 1})" else s"($a)[${i + 1}]"
  /** parse with format, render yyyy-MM-dd (null if invalid) */
  def d2iso(e: String, sparkFmt: String, duckFmt: String): String =
    if (isSpark) s"date_format(try_to_date($e, '$sparkFmt'), 'yyyy-MM-dd')"
    else s"strftime(try_strptime($e, '$duckFmt'), '%Y-%m-%d')"
  /** is-parseable predicate */
  def dok(e: String, sparkFmt: String, duckFmt: String): String =
    if (isSpark) s"try_to_date($e, '$sparkFmt') IS NOT NULL"
    else s"try_strptime($e, '$duckFmt') IS NOT NULL"
  /** list filter/transform (identical lambda syntax, different names) */
  def lfilter(l: String, lam: String): String =
    if (isSpark) s"filter($l, $lam)" else s"list_filter($l, $lam)"
  def lmap(l: String, lam: String): String =
    if (isSpark) s"transform($l, $lam)" else s"list_transform($l, $lam)"
  /** sum of int list (Spark aggregate never null; DuckDB list_sum null on empty) */
  def lsum(l: String): String =
    if (isSpark) s"aggregate($l, 0, (a, b) -> a + b)"
    else s"coalesce(list_sum($l), 0)"
  /** stable 32-bit-ish non-negative int from a string expr (same value both
    * engines): first 8 md5 hex chars as int. */
  def h32(x: String): String =
    if (isSpark) s"CAST(conv(substr(md5($x), 1, 8), 16, 10) AS BIGINT)"
    else s"('0x' || substr(md5($x), 1, 8))::BIGINT"
  /** stable 60-bit hash (15 hex chars) */
  def h60(x: String): String =
    if (isSpark) s"CAST(conv(substr(md5($x), 1, 15), 16, 10) AS BIGINT)"
    else s"('0x' || substr(md5($x), 1, 15))::BIGINT"
  /** bigint right-shift (Spark SQL has no >> operator; DuckDB does) */
  def shr(x: String, n: Int): String =
    if (isSpark) s"shiftright($x, $n)" else s"($x >> $n)"
  /** bigint xor (DuckDB's ^ is POWER; its xor is a function) */
  def bxor(a: String, b: String): String =
    if (isSpark) s"($a ^ $b)" else s"xor($a, $b)"
  /** timestamp -> 'yyyy-MM-dd HH:mm:ss' string */
  def ts2s(e: String): String =
    if (isSpark) s"date_format($e, 'yyyy-MM-dd HH:mm:ss')"
    else s"strftime($e, '%Y-%m-%d %H:%M:%S')"
  /** CJK Han block char-class regex — literal chars, identical in both
    * engines (avoids \u vs \x{} escape-syntax divergence). */
  def hanClass: String = "[" + 0x4e00.toChar + "-" + 0x9fff.toChar + "]"
  /** drop empty strings from a literal list and join with sep — the
    * validation-error rendering (DuckDB array_to_string is NULL on empty). */
  def joinNonEmpty(items: Seq[String], sep: String): String =
    if (isSpark)
      s"array_join(filter(array(${items.mkString(", ")}), x -> x <> ''), '$sep')"
    else
      s"coalesce(array_to_string(list_filter([${items.mkString(", ")}], x -> x <> ''), '$sep'), '')"
}

object Dialect {
  val Spark: D = D(true)
  val Duck: D = D(false)

  /** Planted contract text: deterministic function of (doc_id, text) in the
    * COMMON dialect subset, evaluated identically by Spark and DuckDB. The
    * driver-provided documents.text is word-salad, so extraction operators
    * are exercised against this planted column concatenated with the real
    * text. Variation exercises every extractor branch: missing fields, all
    * four amount locales, invalid calendar dates, both date patterns,
    * markdown tables, clause headers, emails, CNPJ. */
  val Ctext: String =
    """('# ' || CASE CAST(doc_id % 6 AS INT)
      |  WHEN 0 THEN 'Master Service Agreement'
      |  WHEN 1 THEN 'Local Service Agreement'
      |  WHEN 2 THEN 'Statement of Work'
      |  WHEN 3 THEN 'Project Work Order'
      |  WHEN 4 THEN 'Change Request'
      |  ELSE 'Change Notification Form' END || chr(10)
      | || CASE WHEN doc_id % 16 <> 1 THEN 'Contract Number: K-' || lpad(CAST(doc_id * 7 % 9999 AS STRING), 4, '0') || chr(10) ELSE '' END
      | || CASE WHEN doc_id % 16 <> 2 THEN 'Client: Acme Corp Vendor: Beta Ltd' || chr(10) ELSE '' END
      | || 'Total Value: ' || CASE CAST(doc_id % 4 AS INT)
      |  WHEN 0 THEN 'R$ 150.000,00' WHEN 1 THEN 'US$ 50,000.00'
      |  WHEN 2 THEN '€ 25.000,00' ELSE CAST(doc_id % 900 + 100 AS STRING) || ',5' END || chr(10)
      | || CASE WHEN doc_id % 5 <> 2 THEN 'Effective Date: ' || lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0') || '/' || lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') || '/' || CAST(2019 + doc_id % 6 AS STRING) || ' Expiration Date: ' || lpad(CAST(doc_id % 28 + 1 AS STRING), 2, '0') || '/' || lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') || '/' || CAST(2022 + doc_id % 6 AS STRING) || chr(10) ELSE '' END
      | || CASE WHEN doc_id % 9 = 0 THEN 'Signed: 31/02/2021 Alt: 2021-13-05' || chr(10) ELSE '' END
      | || CASE WHEN doc_id % 4 = 1 THEN 'Review: 2022-11-30' || chr(10) ELSE '' END
      | || CASE WHEN doc_id % 7 = 0 THEN '| a | b |' || chr(10) || '|---|---|' || chr(10) || '| 1 | 2 |' || chr(10) ELSE '' END
      | || CASE WHEN doc_id % 3 = 0 THEN 'Vigência: ok. Pagamentos: due monthly. Email: u' || CAST(doc_id % 50 AS STRING) || '@ex.com CNPJ: 12.345.678/0001-90' || chr(10) ELSE '' END
      | || text)""".stripMargin.replace("\n", " ").replaceAll("\\s+", " ")

  /** Planted filename column (P12/P13/P21 inputs): cycles through safe and
    * CJK names the reference's own fixtures use. */
  val Fname: String =
    """(CASE CAST(doc_id % 4 AS INT)
      |  WHEN 0 THEN 'normal_file_' || CAST(doc_id AS STRING) || '.pdf'
      |  WHEN 1 THEN '框架合同_' || CAST(doc_id AS STRING) || '.pdf'
      |  WHEN 2 THEN '【御見積書】_システム運用サポート.pdf'
      |  ELSE 'Acme_MSA_2024_' || CAST(doc_id AS STRING) || '.pdf' END)""".stripMargin
      .replace("\n", " ").replaceAll("\\s+", " ")
}
