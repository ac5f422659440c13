package graft.queries

/** Training-data pipeline operators over `documents`/`embeddings`: exact +
  * near dedup, minhash signatures, deterministic stratified sampling,
  * language ID, quality scoring, token counting, fingerprinting, and
  * brute-force cosine ANN. All hashes are md5-derived so Spark and DuckDB
  * compute identical values (no engine-specific hash functions). */
object TrainingQueries {

  private def q(body: D => String): (String, String) =
    (body(Dialect.Spark), body(Dialect.Duck))

  private def words(col: String) = s"regexp_extract_all(lower($col), '[a-z0-9]+', 0)"

  /** DuckDB-only oracle for d07_dedup_components: the d02 jaccard pairs as
    * an undirected edge list, closed transitively with a recursive CTE
    * (min-label reachability), then keeper = min id per component. The
    * Spark side runs the REAL operator (large-star/small-star CC over the
    * same d02 pair edges) — this twin is the value-exact spec at test
    * scale, like v04's VALUES golden. */
  val D07OracleDuck: String = {
    val d = Dialect.Duck
    val inter = "len(list_intersect(a.ws, b.ws))"
    val jac = s"$inter * 1e0 / nullif(${d.size("a.ws")} + ${d.size("b.ws")} - $inter, 0)"
    s"""WITH RECURSIVE w AS (SELECT doc_id, lang, n_chars, list_distinct(${words("text")}) AS ws FROM documents),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM w a JOIN w b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |   AND abs(a.n_chars - b.n_chars) <= 5
       |  WHERE $jac >= 0.2),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach AS (SELECT doc_id AS id, doc_id AS comp FROM documents
       |  UNION
       |  SELECT e.dst AS id, r.comp AS comp FROM reach r JOIN edges e ON e.src = r.id)
       |SELECT id AS doc_id, min(comp) AS component,
       |  CASE WHEN id = min(comp) THEN 1 ELSE 0 END AS is_keeper
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB-only oracle for d08_embed_components: the d06 brute-force
    * cosine pairs as edges, closed transitively with a recursive CTE,
    * keeper = min vec_id per component — the embedding-space twin of
    * D07OracleDuck (the Spark side runs the real large-star/small-star
    * operator over the same d06 edges). */
  val D08OracleDuck: String = {
    val sim = "list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
    s"""WITH RECURSIVE pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE round($sim, 6) >= 0.4),
       |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
       |  UNION ALL SELECT vec_b AS src, vec_a AS dst FROM pairs),
       |reach AS (SELECT vec_id AS id, vec_id AS comp FROM embeddings
       |  UNION
       |  SELECT e.dst AS id, r.comp AS comp FROM reach r JOIN edges e ON e.src = r.id)
       |SELECT id AS vec_id, min(comp) AS component,
       |  CASE WHEN id = min(comp) THEN 1 ELSE 0 END AS is_keeper
       |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin.replace("\n", " ")
  }

  /** Shared WITH-chain for the d11/a06 decision layer: per-doc first-hit
    * decision over exact-dup keeper (d01 key), contamination (d09 bench),
    * and quality (t02's token/punct predicate plus the C4-style 150-char
    * minimum-length floor — the floor is what fires on this corpus, so
    * every decision branch is exercised). Ends with CTE `decided`. */
  private def decisionBody(d: D): String = {
    val ctext = Dialect.Ctext
    val nTok = d.size("regexp_extract_all(text, '\\S+', 0)")
    val nPunct = d.size("regexp_extract_all(text, '[.,;:!?]', 0)")
    s"""WITH keyed AS (
       |  SELECT doc_id, md5(substr(text, 1, 24)) AS key,
       |         CASE WHEN $nTok >= 10
       |               AND $nPunct * 1e0 / nullif(length(text), 0) < 0.2
       |               AND length(text) >= 150
       |              THEN 1 ELSE 0 END AS quality_ok,
       |         $ctext AS ctext
       |  FROM documents),
       |keepers AS (SELECT key, min(doc_id) AS keeper FROM keyed GROUP BY key),
       |bench AS (SELECT snippet FROM (VALUES
       |  ('US$$ 50,000.00'), ('Vigência: ok. Pagamentos: due monthly.'),
       |  ('Signed: 31/02/2021 Alt: 2021-13-05'), ('Contract Number: K-0049'))
       |  AS b(snippet)),
       |contam AS (
       |  SELECT DISTINCT doc_id FROM keyed c JOIN bench b
       |  ON instr(c.ctext, b.snippet) > 0),
       |decided AS (
       |  SELECT a.doc_id,
       |    CASE WHEN a.doc_id <> k.keeper THEN 'exact_dup'
       |         WHEN c.doc_id IS NOT NULL THEN 'contaminated'
       |         WHEN a.quality_ok = 0 THEN 'low_quality'
       |         ELSE 'keep' END AS decision,
       |    CASE WHEN a.doc_id = k.keeper AND c.doc_id IS NULL
       |          AND a.quality_ok = 1 THEN 1 ELSE 0 END AS keep
       |  FROM keyed a JOIN keepers k ON a.key = k.key
       |  LEFT JOIN contam c ON a.doc_id = c.doc_id)""".stripMargin
  }

  /** DuckDB oracle for x18_decontaminate_grams: the 13-gram corpus/bench
    * overlap recomputed with DuckDB list ops over gram STRINGS (the Spark
    * side joins on xxhash64 keys; distinct-gram counts are equal). */
  val X18OracleDuck: String = {
    val ctext = Dialect.Ctext
    s"""WITH base AS (SELECT doc_id, $ctext AS ctext FROM documents),
       |w AS (SELECT doc_id, list_filter(string_split(lower(regexp_replace(ctext, '[^a-zA-Z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w FROM base),
       |g AS (SELECT DISTINCT doc_id, gram FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(w) >= 13
       |    THEN list_transform(range(1, len(w) - 11), i -> array_to_string(w[i:i+12], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS gram FROM w) t),
       |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 7)
       |SELECT g.doc_id, CAST(count(*) AS INT) AS n_hits
       |FROM g JOIN bg ON g.gram = bg.gram WHERE g.doc_id % 10 <> 7
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB oracle for x27_contamination_score — the graded overlap form
    * (Decontaminate.overlapScore): every corpus doc with its distinct
    * 13-gram count, the distinct shared-gram count vs the bench split,
    * and the rounded overlap ratio. Same gram-string re-derivation as
    * X18OracleDuck (the Spark side counts distinct xxhash64 gram hashes;
    * the oracle counts distinct gram STRINGS — equal absent collisions,
    * the x18 precedent), extended with the total-gram denominator and a
    * doc-universe left join so gram-free docs score 0. */
  val X27OracleDuck: String = {
    val ctext = Dialect.Ctext
    s"""WITH base AS (SELECT doc_id, $ctext AS ctext FROM documents),
       |w AS (SELECT doc_id, list_filter(string_split(lower(regexp_replace(ctext, '[^a-zA-Z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w FROM base),
       |g AS (SELECT DISTINCT doc_id, gram FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(w) >= 13
       |    THEN list_transform(range(1, len(w) - 11), i -> array_to_string(w[i:i+12], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS gram FROM w) t),
       |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 7),
       |counts AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams
       |  FROM g WHERE doc_id % 10 <> 7 GROUP BY doc_id),
       |hits AS (SELECT g.doc_id, CAST(count(*) AS INT) AS n_hits
       |  FROM g JOIN bg ON g.gram = bg.gram WHERE g.doc_id % 10 <> 7
       |  GROUP BY g.doc_id)
       |SELECT b.doc_id, coalesce(c.n_grams, 0) AS n_grams,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  round(coalesce(h.n_hits, 0) * 1e0 / greatest(coalesce(c.n_grams, 0), 1), 6) AS overlap_ratio
       |FROM (SELECT DISTINCT doc_id FROM base WHERE doc_id % 10 <> 7) b
       |LEFT JOIN counts c ON b.doc_id = c.doc_id
       |LEFT JOIN hits h ON b.doc_id = h.doc_id
       |ORDER BY b.doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB oracle for x29_selfdup_score — intra-corpus duplicated-gram
    * scoring (Decontaminate.selfDupScore): per doc, distinct 13-grams,
    * how many appear in >= 2 docs, and the rounded fraction. Same
    * gram-string re-derivation as X18/X27. */
  val X29OracleDuck: String = {
    val ctext = Dialect.Ctext
    s"""WITH base AS (SELECT doc_id, $ctext AS ctext FROM documents),
       |w AS (SELECT doc_id, list_filter(string_split(lower(regexp_replace(ctext, '[^a-zA-Z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w FROM base),
       |g AS (SELECT DISTINCT doc_id, gram FROM (
       |  SELECT doc_id, unnest(CASE WHEN len(w) >= 13
       |    THEN list_transform(range(1, len(w) - 11), i -> array_to_string(w[i:i+12], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS gram FROM w) t),
       |sh AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
       |counts AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams FROM g GROUP BY doc_id),
       |dups AS (SELECT g.doc_id, CAST(count(*) AS INT) AS n_dup
       |  FROM g JOIN sh ON g.gram = sh.gram GROUP BY g.doc_id)
       |SELECT b.doc_id, coalesce(c.n_grams, 0) AS n_grams,
       |  coalesce(d.n_dup, 0) AS n_dup,
       |  round(coalesce(d.n_dup, 0) * 1e0 / greatest(coalesce(c.n_grams, 0), 1), 6) AS dup_ratio
       |FROM (SELECT DISTINCT doc_id FROM base) b
       |LEFT JOIN counts c ON b.doc_id = c.doc_id
       |LEFT JOIN dups d ON b.doc_id = d.doc_id
       |ORDER BY b.doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB oracle for x39_substr_dedup — duplicated-span removal
    * (Decontaminate.removeDupSpans): an independent re-derivation of the
    * keeper rule, the marked gram starts, the running-max interval
    * coverage, and the word-level text rebuild, over gram STRINGS (the
    * Spark side marks via xxhash64 gram keys — identical coverage absent
    * collisions, the x18/x29 precedent; the rebuilt TEXT is then
    * hash-compared, so a collision would fail the gate, not hide). */
  val X39OracleDuck: String = substrDedupDuck(shardOnly = false)

  /** DuckDB oracle for x41_substr_dedup_served — the SAME full-run
    * re-derivation restricted to the shard rows (doc_id ≥ 3/4 of the id
    * space): under the shard-ids-larger contract the served index probe
    * is value-equal to the full corpus∪shard run, so the served path
    * gets a green hash-compare, not a rows-only check. */
  val X41OracleDuck: String = substrDedupDuck(shardOnly = true)

  private def substrDedupDuck(shardOnly: Boolean): String = {
    val ctext = Dialect.Ctext
    val shardFilter = if (shardOnly)
      " WHERE b.doc_id >= (SELECT CAST(floor((max(doc_id) + 1) * 3 / 4) AS BIGINT) FROM documents)"
    else ""
    s"""WITH base AS (SELECT doc_id, $ctext AS ctext FROM documents),
       |w AS (SELECT doc_id, list_filter(string_split(lower(regexp_replace(ctext, '[^a-zA-Z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS w FROM base),
       |tok AS (SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS word FROM w),
       |g AS (SELECT doc_id, unnest(range(0, greatest(len(w) - 12, 0))) AS pos,
       |  unnest(CASE WHEN len(w) >= 13
       |    THEN list_transform(range(1, len(w) - 11), i -> array_to_string(w[i:i+12], ' '))
       |    ELSE CAST([] AS VARCHAR[]) END) AS gram FROM w),
       |sh AS (SELECT gram, min(doc_id) AS keeper FROM g GROUP BY gram
       |  HAVING count(DISTINCT doc_id) >= 2),
       |mk AS (SELECT g.doc_id, g.pos FROM g JOIN sh ON g.gram = sh.gram
       |  WHERE g.doc_id <> sh.keeper),
       |cov AS (SELECT t.doc_id, t.pos, t.word,
       |  max(CASE WHEN m.pos IS NOT NULL THEN m.pos + 13 END)
       |    OVER (PARTITION BY t.doc_id ORDER BY t.pos ROWS UNBOUNDED PRECEDING) AS cov_end
       |  FROM tok t LEFT JOIN mk m ON t.doc_id = m.doc_id AND t.pos = m.pos),
       |kept AS (SELECT doc_id, pos, word FROM cov WHERE cov_end IS NULL OR cov_end <= pos),
       |nw AS (SELECT doc_id, CAST(count(*) AS INT) AS n_words FROM tok GROUP BY doc_id),
       |agg AS (SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
       |  string_agg(word, ' ' ORDER BY pos) AS text_clean FROM kept GROUP BY doc_id)
       |SELECT b.doc_id, coalesce(nw.n_words, 0) AS n_words,
       |  coalesce(nw.n_words, 0) - coalesce(agg.n_kept, 0) AS n_removed,
       |  coalesce(agg.text_clean, '') AS text_clean
       |FROM base b LEFT JOIN nw ON b.doc_id = nw.doc_id
       |LEFT JOIN agg ON b.doc_id = agg.doc_id$shardFilter
       |ORDER BY b.doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB oracle for x45_lm_retrain — the LM drift alarm CLOSED into
    * its ACTION, value-exact: phase 'before' re-derives x42's alarm (the
    * model trained on `documents`, the drift shard — a deterministic
    * corpus slice + planted consonant-salad junk — scored through the
    * full smoothing-fallback path, per-language below-cut fraction > 0.1
    * firing); phase 'after' re-derives the RETRAINED model over the
    * grown corpus (documents UNION ALL the junk — the FineWeb/CCNet
    * posture: refit on what the pipeline now ingests) and scores the
    * SAME shard against the refit half-min cuts. The junk register's own
    * scores now define each language's training minimum, so cut = min/2
    * sits strictly below every shard score — n_below = 0 for every
    * language, the alarm clears, and version moves 0 → 1 (the Spark
    * side reports `graft.io.Models.current` around `Lm.retrainModel`'s
    * crash-safe pointer publish). Both model chains share the shard's
    * bigram counts (`sbgc`); every comparison is exact by the x42
    * construction (quantized BIGINT scores, exact halving, integer
    * division). */
  val X45OracleDuck: String = {
    val d = Dialect.Duck
    val junk = Seq("de", "en", "es", "fr", "zh").flatMap { l =>
      Seq(s"(CAST(91${l.map(_.toInt).mkString}01 AS BIGINT), '$l', " +
        "'xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz')",
        s"(CAST(91${l.map(_.toInt).mkString}02 AS BIGINT), '$l', " +
          "'qvxk zjqw kvxz jqzv xkqj vzqx wkjq zxvq jkqz vqxj kzjv qxwz')")
    }.mkString(", ")
    // one model chain, suffixed: trained on `src`, cuts = half the
    // training minimum, the shared shard counts scored against it
    def chain(src: String, x: String): String =
      s"""norm$x AS (SELECT doc_id, lang, ${LmSql.norm(d)} AS s FROM $src),
         |bgx$x AS (SELECT doc_id, lang, ${LmSql.bigrams(d)} AS bg FROM norm$x),
         |bgc$x AS (SELECT doc_id, lang, bg, CAST(count(*) AS BIGINT) AS cnt
         |  FROM bgx$x GROUP BY doc_id, lang, bg),
         |mdl$x AS (SELECT lang, bg, CAST(sum(cnt) AS BIGINT) AS c2
         |  FROM bgc$x GROUP BY lang, bg),
         |pre$x AS (SELECT lang, substr(bg, 1, 1) AS c1, CAST(sum(c2) AS BIGINT) AS c1n
         |  FROM mdl$x GROUP BY lang, substr(bg, 1, 1)),
         |qt$x AS (SELECT m.lang, m.bg, ${LmSql.q} AS q
         |  FROM mdl$x m JOIN pre$x p ON m.lang = p.lang AND substr(m.bg, 1, 1) = p.c1),
         |qdt$x AS (SELECT lang, c1, CAST(floor(1e9 / (c1n + 37)) AS BIGINT) AS qd FROM pre$x),
         |tsc$x AS (SELECT b.doc_id, b.lang, CAST(sum(b.cnt) AS BIGINT) AS n_pos,
         |  CAST(sum(b.cnt * q.q) AS BIGINT) AS sum_q
         |  FROM bgc$x b JOIN qt$x q ON b.lang = q.lang AND b.bg = q.bg
         |  GROUP BY b.doc_id, b.lang),
         |cuts$x AS (SELECT lang,
         |  min(${LmSql.score("sum_q", "n_pos")}) / 2 AS lm_cut
         |  FROM tsc$x GROUP BY lang),
         |ssc$x AS (SELECT b.doc_id, b.lang, CAST(sum(b.cnt) AS BIGINT) AS n_pos,
         |  CAST(sum(b.cnt * coalesce(q.q, p.qd, 27027027)) AS BIGINT) AS sum_q
         |  FROM sbgc b LEFT JOIN qt$x q ON b.lang = q.lang AND b.bg = q.bg
         |  LEFT JOIN qdt$x p ON b.lang = p.lang AND substr(b.bg, 1, 1) = p.c1
         |  GROUP BY b.doc_id, b.lang),
         |scored$x AS (SELECT s.doc_id, s.lang,
         |  ${LmSql.score("coalesce(c.sum_q, 0)", "coalesce(c.n_pos, 0)")} AS lm_score
         |  FROM shard s LEFT JOIN ssc$x c ON s.doc_id = c.doc_id),
         |drift$x AS (SELECT sc.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN sc.lm_score < k.lm_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
         |  round(sum(CASE WHEN sc.lm_score < k.lm_cut THEN 1 ELSE 0 END) * 1e0 / count(*), 6) AS below_frac,
         |  CAST(CASE WHEN round(sum(CASE WHEN sc.lm_score < k.lm_cut THEN 1 ELSE 0 END) * 1e0 / count(*), 6) > 0.1
         |    THEN 1 ELSE 0 END AS INT) AS retrain
         |FROM scored$x sc JOIN cuts$x k ON sc.lang = k.lang
         |GROUP BY sc.lang, k.lm_cut)""".stripMargin
    s"""WITH shard AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 100 = 3
       |  UNION ALL SELECT * FROM (VALUES $junk) AS j(doc_id, lang, text)),
       |grown AS (SELECT doc_id, lang, text FROM documents
       |  UNION ALL SELECT * FROM (VALUES $junk) AS g(doc_id, lang, text)),
       |snorm AS (SELECT doc_id, lang, ${LmSql.norm(d)} AS s FROM shard),
       |sbg AS (SELECT doc_id, lang, ${LmSql.bigrams(d)} AS bg FROM snorm),
       |sbgc AS (SELECT doc_id, lang, bg, CAST(count(*) AS BIGINT) AS cnt
       |  FROM sbg GROUP BY doc_id, lang, bg),
       |${chain("documents", "0")},
       |${chain("grown", "1")}
       |SELECT 'before' AS phase, lang, n_docs, n_below, below_frac, retrain,
       |  CAST(0 AS BIGINT) AS version FROM drift0
       |UNION ALL
       |SELECT 'after' AS phase, lang, n_docs, n_below, below_frac, retrain,
       |  CAST(1 AS BIGINT) AS version FROM drift1
       |ORDER BY phase, lang""".stripMargin.replace("\n", " ")
  }

  /** DuckDB oracle for x46_probe_retrain — the PROBE drift alarm closed
    * into its action, value-exact through BOTH gradient-descent fits:
    * phase 'before' trains the t13 chain on `documents` (suffix `_a`),
    * persists nothing but derives the same train_keep_rate
    * `Probe.writeModel` stores, and measures a junk-flooded shard's keep
    * fraction against it — the divergence fires; phase 'after' re-runs
    * the ENTIRE 24-iteration GD chain on the grown corpus (documents
    * UNION ALL the junk, suffix `_b`) and measures the grown stream
    * itself, whose keep fraction equals the refit train_keep_rate by
    * construction — drift 0, alarm quiet, version 0 → 1. Unlike the LM
    * (whose refit cut adapts to the junk register and clears on the SAME
    * shard), the probe gates junk OUT by design, so a junk-dominated
    * shard keeps alarming under any fit: the cleared reading is the
    * representative stream — exactly `RetrainSpec`'s convergence posture.
    * The Spark side runs `ops.Probe.retrainModel` (the in-engine GD refit
    * + crash-safe pointer publish); every number here is exact by t13's
    * construction (quantized gradients, margin-midpoint cut, rounded
    * rates). */
  // lazy: renders via probeModelSql, which reads ProbeIters — declared
  // further down this object, so a strict val here would see 0 mid-init
  lazy val X46OracleDuck: String = {
    val d = Dialect.Duck
    val P = ProbeSql
    val score = P.score
    val junk = (0 until 20).map(i =>
      s"(CAST(${920000 + i} AS BIGINT), " +
        "'xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz')")
      .mkString(", ")
    def driftRow(phase: String, agg: String, rate: String, version: Int) =
      s"""SELECT '$phase' AS phase, n_docs, n_keep,
         |  round(n_keep * 1e0 / n_docs, 6) AS keep_frac, train_keep_rate,
         |  round(abs(round(n_keep * 1e0 / n_docs, 6) - train_keep_rate), 6) AS drift,
         |  CAST(CASE WHEN n_docs = 0 OR
         |    round(abs(round(n_keep * 1e0 / n_docs, 6) - train_keep_rate), 6) > 15e-2
         |    THEN 1 ELSE 0 END AS INT) AS retrain,
         |  CAST($version AS BIGINT) AS version FROM $agg CROSS JOIN $rate"""
        .stripMargin
    s"""WITH shard AS (SELECT doc_id, text FROM documents WHERE doc_id % 100 = 3
       |  UNION ALL SELECT * FROM (VALUES $junk) AS j(doc_id, text)),
       |grown AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT * FROM (VALUES $junk) AS g(doc_id, text)),
       |${probeModelSql(d, "documents", "_a", withKeyword = false)},
       |p_a AS (SELECT CASE WHEN round($score, 6) >= cut THEN 1 ELSE 0 END AS pred
       |  FROM feats_a CROSS JOIN cut_a),
       |rate_a AS (SELECT round(avg(pred), 6) AS train_keep_rate FROM p_a),
       |sfeats AS (SELECT doc_id, ${P.x1(d)} AS x1, ${P.x2(d)} AS x2,
       |  ${P.x3(d)} AS x3 FROM shard WHERE text IS NOT NULL),
       |sp_a AS (SELECT CASE WHEN round($score, 6) >= cut THEN 1 ELSE 0 END AS pred
       |  FROM sfeats CROSS JOIN cut_a),
       |agg_a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(coalesce(sum(pred), 0) AS BIGINT) AS n_keep FROM sp_a),
       |${probeModelSql(d, "grown", "_b", withKeyword = false)},
       |p_b AS (SELECT CASE WHEN round($score, 6) >= cut THEN 1 ELSE 0 END AS pred
       |  FROM feats_b CROSS JOIN cut_b),
       |rate_b AS (SELECT round(avg(pred), 6) AS train_keep_rate FROM p_b),
       |agg_b AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(coalesce(sum(pred), 0) AS BIGINT) AS n_keep FROM p_b)
       |${driftRow("before", "agg_a", "rate_a", 0)}
       |UNION ALL
       |${driftRow("after", "agg_b", "rate_b", 1)}
       |ORDER BY phase""".stripMargin.replace("\n", " ")
  }

  /** The d14 mixture arithmetic as shared expression strings: the SQL tier
    * (mixBody, both dialects) and the served operator form (`ops.Mix`,
    * Spark dialect) render from the SAME builders, so their outputs are
    * value-equal by construction — x36 pins the served form against d14's
    * DuckDB oracle. Column references each expression assumes: `rate`
    * reads (w, dom_tok) and windows over the per-domain frame; `nCopies`
    * reads (doc_id, rate_bp). */
  private[graft] object MixSql {
    /** Whitespace-run token count, BIGINT. */
    def ntok(d: D): String =
      s"CAST(${d.size("regexp_extract_all(text, '\\S+', 0)")} AS BIGINT)"
    /** Deterministic 1..8 target weight from the source name. */
    def w(d: D): String = s"1 + ${d.h32("source")} % 8"
    /** Sampling rate in basis points: weight share of an 80% token budget
      * over the domain's available tokens, clipped at 4x. The grand totals
      * are window sums over the tiny per-domain frame — never a second
      * corpus pass. */
    def rate(d: D): String =
      """CAST(floor(least(4e0,
        |    (sum(dom_tok) OVER () * 8e-1 * w / sum(w) OVER ()) / dom_tok) * 10000) AS BIGINT)"""
        .stripMargin.replace("\n", " ")
    /** Materialized copy count: floor(rate) + Bernoulli(frac) via an md5
      * threshold — integers end to end, no float compare. */
    def nCopies(d: D): String =
      s"""CAST(floor(rate_bp * 1e0 / 10000) AS INT)
         |    + CASE WHEN ${d.h32("'mix|' || CAST(doc_id AS STRING)")} % 10000 < rate_bp % 10000 THEN 1 ELSE 0 END"""
        .stripMargin.replace("\n", " ")
  }

  /** The t14 bigram-LM arithmetic as shared expression strings: the SQL
    * tier (t14_lm_score, both dialects) and the served operator form
    * (`ops.Lm`, Spark dialect) render from the SAME builders, so a
    * persisted model scores shards value-identically to the in-query run
    * — x40 pins the served form against t14's DuckDB oracle. Alphabet
    * after normalization is [a-z0-9 ] = 37 symbols (the add-one-smoothing
    * denominator). */
  private[graft] object LmSql {
    /** C4-style normalized text: lowercased alnum runs joined by ' '. */
    def norm(d: D): String =
      if (d.isSpark)
        "array_join(filter(split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ')), ' '), x -> x <> ''), ' ')"
      else
        "coalesce(array_to_string(list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '), x -> x <> ''), ' '), '')"
    /** Character-bigram explode over a normalized string column `s`
      * (empty for strings shorter than 2 — Spark's sequence(1, 0) would
      * DESCEND, so the CASE guard is load-bearing). */
    def bigrams(d: D): String =
      if (d.isSpark)
        "explode(CASE WHEN length(s) >= 2 THEN transform(sequence(1, length(s) - 1), i -> substr(s, i, 2)) ELSE CAST(array() AS array<string>) END)"
      else
        "unnest(CASE WHEN len(s) >= 2 THEN list_transform(range(1, len(s)), i -> substr(s, CAST(i AS INT), 2)) ELSE CAST([] AS VARCHAR[]) END)"
    /** Quantized smoothed bigram probability — columns (c2, c1n) in scope:
      * floor((c2+1)/(c1n+37) * 1e9) as BIGINT, one correctly-rounded IEEE
      * division, identical in both engines. */
    val q: String = "CAST(floor((c2 + 1) * 1e9 / (c1n + 37)) AS BIGINT)"
    /** Mean per-position probability from the exact BIGINT sum. */
    def score(sumQ: String, nPos: String): String =
      s"round($sumQ * 1e0 / greatest($nPos, 1) / 1e9, 6)"
  }

  /** Distributed classifier TRAINING as dialect-shared SQL: unrolled
    * fixed-point batch gradient descent for a linear quality probe
    * (FineWeb/DCLM-style classifier-based filtering, distilling the d11
    * heuristic gate into a smooth score). Engineering that makes it
    * value-exact across engines AND scale-honest:
    *  - squared loss, no exp(): libm vs Math.exp can differ by 1 ulp and
    *    the divergence would compound across iterations;
    *  - per-doc gradient contributions are QUANTIZED to BIGINT
    *    (floor(g * 1e9)) before summing — float sums depend on partition
    *    order, integer sums are exact and associative, so the distributed
    *    aggregate is bit-reproducible at any parallelism;
    *  - weights ride THROUGH each aggregate as max(const) columns, so
    *    iteration k+1 references only g_k — the CTE chain stays linear
    *    (a g_k-cross-w_k shape would reference w_k twice and square the
    *    plan each iteration);
    *  - each iteration is one corpus scan feeding a global partial+final
    *    hash aggregate with a broadcast 1-row weights frame — exactly
    *    what batch GD costs on a cluster, nothing hidden.
    * Ends with CTEs `feats` (doc_id, x1..x3, y) and `w$iters` (trained
    * weights). */
  private val ProbeIters = 24

  /** The probe's feature/label/score expressions as shared builders —
    * the SQL tier (probeBody, both dialects) and the served operator form
    * (`ops.Probe`, Spark dialect) render from the SAME strings, so a
    * persisted model scores shards value-identically to the in-query
    * training run. `score` assumes columns (b, w1..w3, x1..x3) in scope. */
  private[graft] object ProbeSql {
    def x1(d: D): String = s"least(${MixSql.ntok(d)}, 200) / 2e2"
    def x2(d: D): String = "least(length(text), 1000) / 1e3"
    def np(d: D): String = d.size("regexp_extract_all(text, '[.,;:!?]', 0)")
    def x3(d: D): String =
      s"least(${np(d)} * 1e1 / greatest(length(text), 1), 1e0)"
    def y(d: D): String =
      s"""CASE WHEN ${MixSql.ntok(d)} >= 10
         |        AND ${np(d)} * 1e0 / nullif(length(text), 0) < 0.2
         |        AND length(text) >= 150 THEN 1e0 ELSE 0e0 END"""
        .stripMargin.replace("\n", " ")
    val score: String = "b + w1*x1 + w2*x2 + w3*x3"
  }

  /** `src`/`sfx`/`withKeyword` exist for X46OracleDuck, which renders TWO
    * suffixed chains (bootstrap + retrain) in one query — the defaults
    * render t13's original text byte-identically. */
  private def probeBody(d: D, src: String = "documents", sfx: String = "",
                        withKeyword: Boolean = true): String = {
    val z = ProbeSql.score
    def gsum(mult: String) =
      s"sum(CAST(floor(($z - y)$mult * 1e9) AS BIGINT))"
    val iters = (0 until ProbeIters).map { k =>
      s"""g$k$sfx AS (SELECT ${gsum("")} AS gb, ${gsum(" * x1")} AS g1,
         |  ${gsum(" * x2")} AS g2, ${gsum(" * x3")} AS g3,
         |  max(b) AS b, max(w1) AS w1, max(w2) AS w2, max(w3) AS w3,
         |  max(n) AS n FROM feats$sfx CROSS JOIN w$k$sfx),
         |w${k + 1}$sfx AS (SELECT b - 5e-1 * (gb / 1e9) / n AS b,
         |  w1 - 5e-1 * (g1 / 1e9) / n AS w1,
         |  w2 - 5e-1 * (g2 / 1e9) / n AS w2,
         |  w3 - 5e-1 * (g3 / 1e9) / n AS w3, n FROM g$k$sfx)""".stripMargin
    }.mkString(",\n")
    // the oracle pays 1 + iters regex-tokenization scans if feats inlines;
    // DuckDB's MATERIALIZED hint collapses that to one (Spark has no such
    // syntax and its per-iteration scan IS the honest distributed cost)
    val mat = if (d.isSpark) "" else "MATERIALIZED "
    val lead = if (withKeyword) "WITH " else ""
    s"""${lead}feats$sfx AS $mat(SELECT doc_id,
       |  ${ProbeSql.x1(d)} AS x1,
       |  ${ProbeSql.x2(d)} AS x2,
       |  ${ProbeSql.x3(d)} AS x3,
       |  ${ProbeSql.y(d)} AS y
       |  FROM $src WHERE text IS NOT NULL),
       |w0$sfx AS (SELECT 0e0 AS b, 0e0 AS w1, 0e0 AS w2, 0e0 AS w3,
       |  count(*) * 1e0 AS n FROM feats$sfx),
       |$iters""".stripMargin.replace("\n", " ")
  }

  /** probeBody + the margin-midpoint decision cut, the full trained model
    * in one frame: (cut, b, w1, w2, w3). The Spark render is what
    * `ops.Probe.train` executes to fit and persist the model. */
  private[graft] def probeModelSql(d: D, src: String = "documents",
                                   sfx: String = "",
                                   withKeyword: Boolean = true): String = {
    val score = ProbeSql.score
    s"""${probeBody(d, src, sfx, withKeyword)},
       |cut$sfx AS (SELECT
       |  coalesce((max(CASE WHEN y = 0e0 THEN round($score, 6) END)
       |    + min(CASE WHEN y = 1e0 THEN round($score, 6) END)) / 2e0, 5e-1) AS cut,
       |  max(b) AS b, max(w1) AS w1, max(w2) AS w2, max(w3) AS w3
       |  FROM feats$sfx CROSS JOIN w$ProbeIters$sfx)""".stripMargin
      .replace("\n", " ")
  }

  /** Shared CTE chain for the domain-mixture sampler (d14 + t11): per-doc
    * token counts, per-domain totals, deterministic target weights (1..8
    * from the source-name hash, so both the downsample and the upsample
    * branch fire on this corpus), and the per-doc copy count. The token
    * budget is 80% of the corpus; a domain's target is its weight share of
    * that; rate = target/available, clipped at 4x. Rates are carried in
    * BASIS POINTS so both engines compare integers, never floats:
    * n_copies = floor(rate) + Bernoulli(frac) via an md5 threshold. This
    * IS the at-scale plan: one hash agg to domain totals (tiny -> Spark
    * broadcasts it back), then a single narrow per-doc pass — no sort,
    * nothing global over the corpus. The grand totals are unpartitioned
    * window sums OVER the tiny per-domain frame (#domains rows in one
    * partition), NOT a second pass over the corpus: both a ROLLUP and a
    * scalar-subquery `tot` CTE duplicate the aggregate subtree and
    * re-tokenize the base table — at 10^12 docs the tokenizer pass is
    * the whole cost, so the corpus must be scanned exactly once here
    * (plus once in the final per-doc join). */
  private def mixBody(d: D): String = {
    s"""WITH toks AS (SELECT doc_id, source, ${MixSql.ntok(d)} AS ntok
       |  FROM documents WHERE source IS NOT NULL),
       |dom AS (SELECT source, ${MixSql.w(d)} AS w, sum(ntok) AS dom_tok
       |  FROM toks GROUP BY source),
       |rates AS (SELECT source, ${MixSql.rate(d)} AS rate_bp FROM dom),
       |mix AS (SELECT /*+ BROADCAST(r) */ t.doc_id, t.source, t.ntok, rate_bp,
       |  ${MixSql.nCopies(d)} AS n_copies
       |  FROM toks t JOIN rates r ON t.source = r.source)""".stripMargin
      .replace("\n", " ")
  }

  /** mixBody extended to the sharded form t11/t12 share: each doc repeated
    * n_copies times (inequality join against a 4-row inline table, not a
    * per-row generator), shard = md5(doc,copy) % 8, plus the deterministic
    * md5 shuffle order `ord`. Ends with CTE `sh`. */
  private def shardBody(d: D): String = {
    val key = "CAST(doc_id AS STRING) || '#' || CAST(copy_i AS STRING)"
    s"""${mixBody(d)},
       |copies AS (SELECT m.doc_id, m.ntok, c.i AS copy_i
       |  FROM mix m JOIN (VALUES (0), (1), (2), (3)) AS c(i) ON c.i < m.n_copies),
       |sh AS (SELECT doc_id, ntok, copy_i,
       |  CAST(${d.h32(s"'s|' || $key")} % 8 AS INT) AS shard,
       |  ${d.h60(s"'o|' || $key")} AS ord FROM copies)""".stripMargin
      .replace("\n", " ")
  }

  val all: Map[String, (String, String)] = Map(

    // D1 — exact dedup: hash-groupBy, keep min doc_id per key
    "d01_dedup_exact" -> q { d =>
      """SELECT key, count(*) AS n_dups, min(doc_id) AS keeper
        |FROM (SELECT md5(substr(text, 1, 24)) AS key, doc_id FROM documents) t
        |GROUP BY key ORDER BY key""".stripMargin.replace("\n", " ")
    },

    // D2 — n-gram Jaccard near-dup within (lang, n_chars band) buckets.
    // Spark side equi-joins on the COMPOSITE key (lang, floor(n_chars/6));
    // |a-b| <= 5 implies the bands differ by at most 1, so the probe side
    // explodes to bands {bk-1, bk, bk+1} and each qualifying pair matches
    // exactly ONE delta — linear shuffle, no n^2-per-lang blowup (VERDICT
    // r1 #3; lang alone has ~5 values). The oracle keeps the naive join
    // (same output, simplest-possible spec for DuckDB).
    "d02_jaccard_pairs" -> q { d =>
      val ldist = if (d.isSpark) "array_distinct" else "list_distinct"
      val inter = if (d.isSpark) "size(array_intersect(a.ws, b.ws))" else "len(list_intersect(a.ws, b.ws))"
      val jac = s"$inter * 1e0 / nullif(${d.size("a.ws")} + ${d.size("b.ws")} - $inter, 0)"
      if (d.isSpark)
        s"""WITH w AS (SELECT doc_id, lang, n_chars, $ldist(${words("text")}) AS ws FROM documents),
           |wb AS (SELECT doc_id, lang, n_chars, ws, CAST(floor(n_chars / 6e0) AS BIGINT) AS bk FROM w),
           |probe AS (SELECT doc_id, lang, n_chars, ws, bk + delta AS bk
           |          FROM wb LATERAL VIEW explode(array(-1, 0, 1)) dd AS delta)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, round($jac, 4) AS jaccard
           |FROM probe a JOIN wb b
           |  ON a.lang = b.lang AND a.bk = b.bk AND a.doc_id < b.doc_id
           |  AND abs(a.n_chars - b.n_chars) <= 5
           |WHERE $jac >= 0.2
           |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")
      else
        s"""WITH w AS (SELECT doc_id, lang, n_chars, $ldist(${words("text")}) AS ws FROM documents)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, round($jac, 4) AS jaccard
           |FROM w a JOIN w b
           |  ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  AND abs(a.n_chars - b.n_chars) <= 5
           |WHERE $jac >= 0.2
           |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")
    },

    // D3 — minhash signatures: 4 bands, min over md5-hashed 3-word shingles
    "d03_minhash_sig" -> q { d =>
      val w = words("text")
      val sh =
        if (d.isSpark) s"transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
        else "list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"
      def band(b: Int): String = {
        val hashed = d.lmap("sh", s"x -> ${d.h60(s"'$b|' || x")}")
        if (d.isSpark) s"array_min($hashed)" else s"list_min($hashed)"
      }
      s"""SELECT doc_id, ${band(0)} AS mh0, ${band(1)} AS mh1, ${band(2)} AS mh2, ${band(3)} AS mh3
         |FROM (SELECT doc_id, $sh AS sh FROM (SELECT doc_id, $w AS w FROM documents) t WHERE ${d.size("w")} >= 3) s
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // D4 — the LSH BANDING tier itself, value-exact: banded candidate
    // pairs over md5-based minhash signatures (d03 proves the md5
    // signature form is cross-engine-exact; x05 is the xxhash64 scale
    // path of this same shape). 4 bands x 2 rows — a band's bucket key
    // hashes both of its minhashes with the band id baked into the key
    // string, so the per-band bucket sets need no band column and the
    // union of band selects replaces a posexplode (both engines run it
    // verbatim). The capByKey over-cap predicate is exercised FOR REAL:
    // maxBucket=2 fires on this corpus's 3-doc clone buckets (4 buckets
    // dropped at sf0.01), so the oracle pins banding + cap + a<b pair
    // emission, not just banding. n_shared_bands = how many of the 4
    // bands the pair collided in (the OR-amplification evidence).
    "d04_banded_pairs" -> q { d =>
      val w = words("text")
      val sh =
        if (d.isSpark) s"transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
        else "list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"
      def mh(b: Int): String = {
        val hashed = d.lmap("sh", s"x -> ${d.h60(s"'$b|' || x")}")
        if (d.isSpark) s"array_min($hashed) AS mh$b" else s"list_min($hashed) AS mh$b"
      }
      def bandKey(b: Int): String =
        d.h60(s"'$b|' || CAST(mh${2 * b} AS STRING) || '|' || CAST(mh${2 * b + 1} AS STRING)")
      val bandSelects = (0 until 4)
        .map(b => s"SELECT doc_id, ${bandKey(b)} AS h FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH w AS (SELECT doc_id, $w AS w FROM documents),
         |s AS (SELECT doc_id, $sh AS sh FROM w WHERE ${d.size("w")} >= 3),
         |sig AS (SELECT doc_id, ${(0 until 8).map(mh).mkString(", ")} FROM s),
         |bk AS ($bandSelects),
         |c AS (SELECT h, count(*) AS n FROM bk GROUP BY h),
         |kept AS (SELECT bk.doc_id, bk.h FROM bk JOIN c ON bk.h = c.h WHERE c.n <= 2)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(count(*) AS INT) AS n_shared_bands
         |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")
    },

    // T10 — per-domain curation rollup (C4/Gopher/RefinedWeb-style): every
    // serious crawl pipeline aggregates quality AT THE SOURCE/DOMAIN level
    // before per-doc filtering — a spam domain is dropped wholesale, not
    // doc by doc. Per source: doc count, mean chars/tokens, exact-dup rate
    // (1 - distinct d01 keys / docs), and the keep/drop decision. One
    // hash agg + a distinct-count (two-level agg) — at 10^12 docs this is
    // the cheap query that saves the expensive ones. Thresholds fire both
    // branches on this corpus (mean chars straddle 280; two sources carry
    // planted dup clusters).
    "t10_domain_stats" -> q { d =>
      val ntok = d.size("regexp_extract_all(text, '\\S+', 0)")
      s"""WITH base AS (SELECT source, n_chars, $ntok AS ntok,
         |  md5(substr(text, 1, 24)) AS key FROM documents),
         |agg AS (SELECT source, count(*) AS n_docs,
         |  round(avg(n_chars), 4) AS mean_chars,
         |  round(avg(ntok), 4) AS mean_tokens,
         |  round(1 - count(DISTINCT key) * 1e0 / count(*), 6) AS dup_rate
         |  FROM base GROUP BY source)
         |SELECT source, CAST(n_docs AS INT) AS n_docs, mean_chars,
         |  mean_tokens, dup_rate,
         |  CASE WHEN dup_rate > 0.02 THEN 'drop_dup_farm'
         |       WHEN mean_chars < 280 THEN 'drop_low_content'
         |       ELSE 'keep' END AS decision
         |FROM agg ORDER BY source""".stripMargin.replace("\n", " ")
    },

    // D14 — domain-mixture quota sampling: fix the training mix at a token
    // budget (the step between curation and packing in every real LLM
    // pipeline — DoReMi/Pile-style weights, here deterministic). Per doc:
    // its domain's sampling rate in basis points and its materialized copy
    // count — 0 = dropped, 1 = kept, >1 = upsampled. See `mixBody` for the
    // rule and the scale argument.
    "d14_domain_mix" -> q { d =>
      s"""${mixBody(d)}
         |SELECT doc_id, source, ntok, rate_bp, n_copies
         |FROM mix ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // T11 — training shards: materialize the d14 mix (each doc repeated
    // n_copies times) into a fixed number of training shards with a
    // deterministic md5 shuffle — shard = hash(doc, copy) % 8, position =
    // rank of hash WITHIN the shard. The within-shard window is the
    // entire point: at 10^12 docs a global sort is impossible, but
    // repartition-by-shard + sortWithinPartitions (exactly this plan —
    // one hash exchange + per-partition sort) writes every shard
    // independently; shard count scales with the corpus so each stays
    // executor-sized. Copy expansion is an inequality join against a
    // 4-row inline table, not a per-row generator.
    "t11_training_shards" -> q { d =>
      s"""${shardBody(d)}
         |SELECT shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id, copy_i) AS INT) AS pos,
         |  doc_id, copy_i, ntok
         |FROM sh ORDER BY shard, pos""".stripMargin.replace("\n", " ")
    },

    // T12 — packed training batches: concat-and-chunk over the t11 shard
    // order (the GPT-pretraining shape — docs are concatenated in shuffle
    // order and SPLIT at fixed 512-token sequence boundaries; t07 is the
    // complementary whole-doc bin packing). Per doc copy: its exclusive
    // running token offset within the shard, the sequence it starts in,
    // the offset inside that sequence, and how many boundaries it crosses.
    // Scale shape: the running sum and the rank share one window spec, so
    // the SAME single hashpartitioning(shard) exchange + within-partition
    // sort feeds both — nothing global; a shard's token total stays far
    // under 2^52 (shard count scales with the corpus), so the floor-double
    // division is exact.
    "t12_packed_batches" -> q { d =>
      val off = """coalesce(sum(ntok) OVER (PARTITION BY shard
        | ORDER BY ord, doc_id, copy_i
        | ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"""
        .stripMargin.replace("\n", " ")
      s"""${shardBody(d)},
         |packed AS (SELECT shard, doc_id, copy_i, ntok,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id, copy_i) AS INT) AS pos,
         |  CAST($off AS BIGINT) AS tok_off
         |  FROM sh)
         |SELECT shard, pos, doc_id, copy_i, ntok, tok_off,
         |  CAST(floor(tok_off / 512e0) AS BIGINT) AS seq_id,
         |  CAST(tok_off % 512 AS INT) AS seq_off,
         |  CAST(CASE WHEN ntok > 0
         |    THEN floor((tok_off + ntok - 1) / 512e0) - floor(tok_off / 512e0)
         |    ELSE 0 END AS INT) AS n_crossings
         |FROM packed ORDER BY shard, pos""".stripMargin.replace("\n", " ")
    },

    // T13 — linear quality probe TRAINED IN-ENGINE: 24 unrolled iterations
    // of fixed-point batch gradient descent distill the d11 heuristic
    // quality gate into a smooth per-doc score (the classifier-based
    // filtering step of FineWeb/DCLM-style pipelines). Value-exact across
    // engines — see `probeBody` for the determinism engineering
    // (quantized gradients, no exp(), linear CTE chain). The decision cut
    // is the MARGIN MIDPOINT between the classes' rounded score extremes
    // (max/min aggregates are order-free exact — no quantization needed;
    // a degenerate single-class corpus falls back to 0.5). Output: per
    // doc the weak label, the trained probe's score, and its decision.
    "t13_quality_probe" -> q { d =>
      val score = ProbeSql.score
      // the threshold aggregate CARRIES the weights through (max of a
      // constant column), so the final select cross-joins ONE frame that
      // holds both — a separate `scored` CTE would be referenced twice
      // and inline the whole 25-scan weights chain twice (plan-audited)
      s"""${probeModelSql(d)}
         |SELECT doc_id, CAST(y AS INT) AS label, round($score, 6) AS score,
         |  CASE WHEN round($score, 6) >= cut THEN 1 ELSE 0 END AS pred
         |FROM feats CROSS JOIN cut ORDER BY doc_id""".stripMargin
        .replace("\n", " ")
    },

    // T14 — in-engine n-gram language-model quality scoring (the CCNet
    // shape: a per-language character-bigram LM with add-one smoothing,
    // trained on the corpus itself, scoring each doc's typicality for ITS
    // language — gibberish and encoding junk score low). Value-exactness
    // engineering mirrors t13: per-position probabilities are QUANTIZED to
    // BIGINT (floor(P * 1e9)) so the distributed per-doc sums are
    // order-free exact at any parallelism; P = (c2+1)/(c1n+37) is one
    // correctly-rounded IEEE division per bigram type, identical in both
    // engines. Scale shape: training is ONE explode + two hash aggs down
    // to a <= #langs x 37^2 model frame (broadcast back); scoring joins
    // per-doc bigram COUNTS (not positions) against it — no per-char row
    // explosion survives past the first agg. The served form (ops.Lm /
    // x40) persists the model and scores shards from it, pinned on this
    // same oracle.
    "t14_lm_score" -> q { d =>
      s"""WITH norm AS (SELECT doc_id, lang, ${LmSql.norm(d)} AS s FROM documents),
         |bg AS (SELECT doc_id, lang, ${LmSql.bigrams(d)} AS bg FROM norm),
         |bgc AS (SELECT doc_id, lang, bg, CAST(count(*) AS BIGINT) AS cnt
         |  FROM bg GROUP BY doc_id, lang, bg),
         |mdl AS (SELECT lang, bg, CAST(sum(cnt) AS BIGINT) AS c2
         |  FROM bgc GROUP BY lang, bg),
         |pre AS (SELECT lang, substr(bg, 1, 1) AS c1, CAST(sum(c2) AS BIGINT) AS c1n
         |  FROM mdl GROUP BY lang, substr(bg, 1, 1)),
         |qt AS (SELECT m.lang, m.bg, ${LmSql.q} AS q
         |  FROM mdl m JOIN pre p ON m.lang = p.lang AND substr(m.bg, 1, 1) = p.c1),
         |sc AS (SELECT b.doc_id, CAST(sum(b.cnt) AS BIGINT) AS n_pos,
         |  CAST(sum(b.cnt * q.q) AS BIGINT) AS sum_q
         |  FROM bgc b JOIN qt q ON b.lang = q.lang AND b.bg = q.bg
         |  GROUP BY b.doc_id)
         |SELECT d.doc_id, d.lang, coalesce(sc.n_pos, 0) AS n_pos,
         |  coalesce(sc.sum_q, 0) AS sum_q,
         |  ${LmSql.score("coalesce(sc.sum_q, 0)", "coalesce(sc.n_pos, 0)")} AS lm_score
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin.replace("\n", " ")
    },

    // X42 — the LM RETRAIN TRIGGER value-exact: train the t14 model,
    // derive the per-language out-of-distribution cut (half the training
    // minimum, the Lm.writeModel rule), score a drift shard — a small
    // deterministic corpus slice UNION ALL planted consonant-salad junk —
    // through the full smoothing-fallback path (LEFT JOIN model, prefix
    // default, unseen-prefix floor(1e9/37)), and aggregate the
    // per-language below-cut fraction + alarm. Every comparison that
    // could straddle an engine boundary is exact by construction: scores
    // are t14's quantized-BIGINT means, the cut is an exact halving of an
    // identical double, below_frac is integer division. The serving form
    // is `ops.Lm.driftStats` (one shard-scale pass against the broadcast
    // persisted model — spec-pinned in LmSpec); this query proves the
    // drift construction itself cross-engine.
    "x42_lm_drift" -> q { d =>
      val junk = Seq("de", "en", "es", "fr", "zh").flatMap { l =>
        Seq(s"(CAST(91${l.map(_.toInt).mkString}01 AS BIGINT), '$l', " +
          "'xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz')",
          s"(CAST(91${l.map(_.toInt).mkString}02 AS BIGINT), '$l', " +
            "'qvxk zjqw kvxz jqzv xkqj vzqx wkjq zxvq jkqz vqxj kzjv qxwz')")
      }.mkString(", ")
      s"""WITH norm AS (SELECT doc_id, lang, ${LmSql.norm(d)} AS s FROM documents),
         |bg AS (SELECT doc_id, lang, ${LmSql.bigrams(d)} AS bg FROM norm),
         |bgc AS (SELECT doc_id, lang, bg, CAST(count(*) AS BIGINT) AS cnt
         |  FROM bg GROUP BY doc_id, lang, bg),
         |mdl AS (SELECT lang, bg, CAST(sum(cnt) AS BIGINT) AS c2
         |  FROM bgc GROUP BY lang, bg),
         |pre AS (SELECT lang, substr(bg, 1, 1) AS c1, CAST(sum(c2) AS BIGINT) AS c1n
         |  FROM mdl GROUP BY lang, substr(bg, 1, 1)),
         |qt AS (SELECT m.lang, m.bg, ${LmSql.q} AS q
         |  FROM mdl m JOIN pre p ON m.lang = p.lang AND substr(m.bg, 1, 1) = p.c1),
         |qdt AS (SELECT lang, c1, CAST(floor(1e9 / (c1n + 37)) AS BIGINT) AS qd FROM pre),
         |tsc AS (SELECT b.doc_id, b.lang, CAST(sum(b.cnt) AS BIGINT) AS n_pos,
         |  CAST(sum(b.cnt * q.q) AS BIGINT) AS sum_q
         |  FROM bgc b JOIN qt q ON b.lang = q.lang AND b.bg = q.bg
         |  GROUP BY b.doc_id, b.lang),
         |cuts AS (SELECT lang,
         |  min(${LmSql.score("sum_q", "n_pos")}) / 2 AS lm_cut
         |  FROM tsc GROUP BY lang),
         |shard AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 100 = 3
         |  UNION ALL SELECT * FROM (VALUES $junk) AS j(doc_id, lang, text)),
         |snorm AS (SELECT doc_id, lang, ${LmSql.norm(d)} AS s FROM shard),
         |sbg AS (SELECT doc_id, lang, ${LmSql.bigrams(d)} AS bg FROM snorm),
         |sbgc AS (SELECT doc_id, lang, bg, CAST(count(*) AS BIGINT) AS cnt
         |  FROM sbg GROUP BY doc_id, lang, bg),
         |ssc AS (SELECT b.doc_id, b.lang, CAST(sum(b.cnt) AS BIGINT) AS n_pos,
         |  CAST(sum(b.cnt * coalesce(q.q, p.qd, 27027027)) AS BIGINT) AS sum_q
         |  FROM sbgc b LEFT JOIN qt q ON b.lang = q.lang AND b.bg = q.bg
         |  LEFT JOIN qdt p ON b.lang = p.lang AND substr(b.bg, 1, 1) = p.c1
         |  GROUP BY b.doc_id, b.lang),
         |scored AS (SELECT s.doc_id, s.lang,
         |  ${LmSql.score("coalesce(c.sum_q, 0)", "coalesce(c.n_pos, 0)")} AS lm_score
         |  FROM shard s LEFT JOIN ssc c ON s.doc_id = c.doc_id)
         |SELECT sc.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN sc.lm_score < k.lm_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
         |  round(sum(CASE WHEN sc.lm_score < k.lm_cut THEN 1 ELSE 0 END) * 1e0 / count(*), 6) AS below_frac,
         |  CAST(CASE WHEN round(sum(CASE WHEN sc.lm_score < k.lm_cut THEN 1 ELSE 0 END) * 1e0 / count(*), 6) > 0.1
         |    THEN 1 ELSE 0 END AS INT) AS retrain
         |FROM scored sc JOIN cuts k ON sc.lang = k.lang
         |GROUP BY sc.lang, k.lm_cut
         |ORDER BY sc.lang""".stripMargin.replace("\n", " ")
    },

    // D13 — the SIMHASH tier value-exact: 60-bit simhash over md5 word
    // hashes (multiset votes: bit b set iff ones outnumber zeros), paired
    // via pigeonhole blocks (4 x 15 bits — hamming <= 3 implies at least
    // one equal block), the bucket-cap predicate, and bit_count(xor) as
    // the exact distance — the whole construction in dialect-shared SQL
    // both engines run (x06 stays the xxhash64/UDF scale path, rows-only
    // by harness contract). maxBucket=2 fires on this corpus's clone
    // buckets, so cap + blocks + distance are all pinned, like d04.
    "d13_simhash_pairs" -> q { d =>
      val hs = d.lmap("w", s"x -> ${d.h60("x")}")
      val h = if (d.isSpark) "explode(hs) AS h" else "unnest(hs) AS h"
      val votes = (0 until 60)
        .map(b => s"sum(${d.shr("h", b)} & 1) AS v$b").mkString(", ")
      val sig = (0 until 60)
        .map(b => s"(CASE WHEN 2 * v$b > n THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")
      val blkSelects = (0 until 4)
        .map(b => s"SELECT doc_id, sim, ${d.shr("sim", 15 * b)} & 32767 AS k, $b AS blk FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH w AS (SELECT doc_id, ${words("text")} AS w FROM documents),
         |e AS (SELECT doc_id, $h FROM (SELECT doc_id, $hs AS hs FROM w WHERE ${d.size("w")} >= 1) t),
         |votes AS (SELECT doc_id, count(*) AS n, $votes FROM e GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sig AS sim FROM votes),
         |bk AS ($blkSelects),
         |c AS (SELECT blk, k, count(*) AS cnt FROM bk GROUP BY blk, k),
         |kept AS (SELECT bk.doc_id, bk.sim, bk.blk, bk.k FROM bk
         |  JOIN c ON bk.blk = c.blk AND bk.k = c.k WHERE c.cnt <= 2)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(${d.bxor("a.sim", "b.sim")}) AS INT) AS hamming
         |FROM kept a JOIN kept b
         |  ON a.blk = b.blk AND a.k = b.k AND a.doc_id < b.doc_id
         |WHERE bit_count(${d.bxor("a.sim", "b.sim")}) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin.replace("\n", " ")
    },

    // D9 — benchmark decontamination, small-bench substring form: flag
    // corpus docs containing any planted benchmark snippet (GPT-3
    // appendix-C hygiene; the snippets hit distinct Ctext branches so the
    // flag set is non-trivial: %4==1 amounts, %3==0 clause line, %9==0
    // sentinel dates, and exactly one contract number). The LARGE-bench
    // scale path is ops.Decontaminate (13-gram hash equi-join, x18) —
    // spec-pinned against brute-force gram intersect.
    "d09_decontaminate" -> q { d =>
      val ctext = Dialect.Ctext
      s"""WITH bench AS (SELECT snippet FROM (VALUES
         |  ('US$$ 50,000.00'), ('Vigência: ok. Pagamentos: due monthly.'),
         |  ('Signed: 31/02/2021 Alt: 2021-13-05'), ('Contract Number: K-0049'))
         |  AS b(snippet))
         |SELECT doc_id, CAST(count(*) AS INT) AS n_hits, min(snippet) AS first_hit
         |FROM documents d JOIN bench b ON instr($ctext, b.snippet) > 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // D10 — corpus-wide duplicate-line removal (C4-style): every line is
    // keyed by md5, the first-seen doc (min doc_id) keeps it, every other
    // doc counts it dropped. Scale shape: the shuffle carries distinct
    // (doc_id, 16-byte hash) pairs only — never line text — through one
    // hash agg (keeper per hash) and one equi-join back.
    "d10_line_dedup" -> q { d =>
      val ctext = Dialect.Ctext
      val rawLines =
        if (d.isSpark) "split(ctext, '\\n')"
        else "string_split_regex(ctext, '\\n')"
      val nel = d.lfilter(rawLines, "x -> x <> ''")
      val un = if (d.isSpark) "explode(nel)" else "unnest(nel)"
      s"""WITH base AS (SELECT doc_id, $nel AS nel
         |  FROM (SELECT doc_id, $ctext AS ctext FROM documents) t),
         |lx0 AS (SELECT doc_id, $un AS line FROM base),
         |lx AS (SELECT DISTINCT doc_id, md5(line) AS h FROM lx0),
         |k AS (SELECT h, min(doc_id) AS keeper FROM lx GROUP BY h)
         |SELECT l.doc_id, CAST(count(*) AS INT) AS n_lines,
         |       CAST(sum(CASE WHEN l.doc_id = k.keeper THEN 1 ELSE 0 END) AS INT) AS n_kept,
         |       CAST(sum(CASE WHEN l.doc_id <> k.keeper THEN 1 ELSE 0 END) AS INT) AS n_dropped
         |FROM lx l JOIN k ON l.h = k.h
         |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin.replace("\n", " ")
    },

    // T6 — PII redaction: mask the reference's email/CNPJ patterns
    // (contract_parser.py:27-37 parity regexes, same literals as p08/p09)
    // and report the redaction count + a digest of the masked text. Pure
    // per-row columnar regexp work — narrow, codegen'd.
    "t06_redact" -> q { d =>
      val ctext = Dialect.Ctext
      val patEmail = "'\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b'"
      val patCnpj = "'(?:\\d{2}\\.\\d{3}\\.\\d{3}/\\d{4}-\\d{2}|\\d{3}\\.\\d{3}\\.\\d{3}-\\d{2})'"
      val nEmails = d.size(s"regexp_extract_all(ctext, $patEmail, 0)")
      val nCnpj = d.size(s"regexp_extract_all(ctext, $patCnpj, 0)")
      val redacted = d.rr(d.rr("ctext", patEmail, "'[EMAIL]'"), patCnpj, "'[ID]'")
      s"""SELECT doc_id,
         |  CAST($nEmails AS INT) + CAST($nCnpj AS INT) AS n_redactions,
         |  CAST(length($redacted) AS INT) AS redacted_len,
         |  md5($redacted) AS redacted_md5
         |FROM (SELECT doc_id, $ctext AS ctext FROM documents) t
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // D11 + A6 — the pipeline DECISION layer: the composed keep/drop
    // endpoint a training-data export actually ships. Rule order (first
    // hit wins): exact-dup loser -> benchmark-contaminated -> low-quality
    // -> keep. One shared body; d11 emits the per-doc decision, a06 the
    // stage funnel (how many docs each gate removes — the observability
    // row every corpus run reports). Scale shape: one hash agg on the
    // content key, one equi-join back, a broadcast-small contamination
    // semi-join; quality is a narrow predicate.
    "d11_training_decision" -> q { d =>
      s"""${decisionBody(d)}
         |SELECT doc_id, decision, keep FROM decided
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    "a06_filter_funnel" -> q { d =>
      s"""${decisionBody(d)}
         |SELECT decision, CAST(count(*) AS INT) AS n_docs
         |FROM decided GROUP BY decision ORDER BY decision""".stripMargin
        .replace("\n", " ")
    },

    // D5 — deterministic stratified sampling (sampleBy with md5 in place of
    // RNG so the oracle can reproduce it)
    "d05_stratified_sample" -> q { d =>
      val h = d.h32("CAST(doc_id AS STRING) || lang")
      s"""SELECT doc_id, lang FROM documents
         |WHERE $h % 100 < CASE WHEN lang = 'en' THEN 30 ELSE 60 END
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // T1 — language ID: Han-script check + stopword-count argmax
    "t01_langid" -> q { d =>
      def sw(langRe: String) = d.size(s"regexp_extract_all(lower(text), '$langRe', 0)")
      val zh = d.size(s"regexp_extract_all(text, '${d.hanClass}', 0)")
      val en = sw("\\b(the|and|of|to|in|is|a)\\b")
      val es = sw("\\b(el|la|de|que|y|los|en|un)\\b")
      val de = sw("\\b(der|die|und|das|ist|ein|zu|den)\\b")
      val fr = sw("\\b(le|la|les|des|et|est|une|dans)\\b")
      s"""SELECT doc_id, lang, predicted,
         |  CASE WHEN predicted = lang THEN 1 ELSE 0 END AS correct
         |FROM (SELECT doc_id, lang,
         |  CASE WHEN $zh > 0 THEN 'zh'
         |       WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
         |       WHEN $es >= $de AND $es >= $fr THEN 'es'
         |       WHEN $de >= $fr THEN 'de'
         |       ELSE 'fr' END AS predicted
         |  FROM documents) t ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // T2 — quality scoring: token/char ratios
    "t02_quality" -> q { d =>
      val nTok = d.size("regexp_extract_all(text, '\\S+', 0)")
      val nPunct = d.size("regexp_extract_all(text, '[.,;:!?]', 0)")
      val nStop = d.size("regexp_extract_all(lower(text), '\\b(the|and|of|to|in)\\b', 0)")
      val noWs = d.rr("text", "'\\s'", "''")
      s"""SELECT doc_id,
         |  $nTok AS n_tokens,
         |  round(length($noWs) * 1e0 / nullif($nTok, 0), 4) AS mean_token_len,
         |  round($nPunct * 1e0 / nullif(length(text), 0), 4) AS punct_ratio,
         |  round($nStop * 1e0 / nullif($nTok, 0), 4) AS stopword_ratio,
         |  CASE WHEN $nTok >= 10 AND $nPunct * 1e0 / nullif(length(text), 0) < 0.2 THEN 1 ELSE 0 END AS keep
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // T3 — token counting: whitespace + BPE-ish segmentation
    "t03_tokens" -> q { d =>
      val ws = d.size("regexp_extract_all(text, '\\S+', 0)")
      val bpe = d.size("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
      s"""SELECT doc_id, $ws AS ws_tokens, $bpe AS bpe_tokens, length(text) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // T7 — sequence packing offsets: each doc's token offset in the
    // doc_id-ordered corpus concatenation + the 512-token training
    // sequences it spans. This twin keeps the window form (global-order
    // cumsum — fine at oracle scale, exactly what canNOT run at 10^12
    // docs); the scale path is ops.Pack.packOffsets (two-pass distributed
    // prefix sum, x22), PackSpec-pinned value-equal to this query.
    "t07_seq_pack" -> q { d =>
      val nTok = d.size("regexp_extract_all(text, '\\S+', 0)")
      s"""WITH t AS (SELECT doc_id, CAST($nTok AS BIGINT) AS ntok FROM documents),
         |p AS (SELECT doc_id, ntok,
         |  CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM t)
         |SELECT doc_id, ntok AS n_tokens, off AS offset,
         |  CAST(floor(off * 1e0 / 512) AS BIGINT) AS first_pack,
         |  CAST(floor((CASE WHEN ntok = 0 THEN off ELSE off + ntok - 1 END) * 1e0 / 512) AS BIGINT) AS last_pack
         |FROM p ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // T8 — TF-IDF keyword extraction: top-3 terms per document by
    // tf * ln(N/df), ties broken lexically. Fully declarative — the plan
    // is two two-level hash aggregates ((doc, word) counts with map-side
    // partials, then per-word doc frequency) and one per-doc window; the
    // word -> df join shuffles on the word key (vocabulary-sized, never
    // corpus-sized rows). Rounded score in BOTH the filter and the order
    // so engine float noise cannot flip ranks.
    "t08_tfidf" -> q { d =>
      val words = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
      val un = if (d.isSpark) s"explode($words)" else s"unnest($words)"
      s"""WITH wx AS (SELECT doc_id, $un AS word FROM documents),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM wx GROUP BY doc_id, word),
         |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM wx GROUP BY word),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.word,
         |         round(tf.tf * ln(n.n_docs * 1e0 / df.df), 6) AS score
         |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, word, score,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score DESC, word) AS rn
         |  FROM scored)
         |SELECT doc_id, word, score FROM ranked WHERE rn <= 3
         |ORDER BY doc_id, word""".stripMargin.replace("\n", " ")
    },

    // T5 — Gopher-style repetition & lexical-diversity signals (Rae et al.
    // 2021 §A.1.1 quality filters: top-word fraction, duplicate-line
    // fraction, unique-word fraction). Word frequencies via explode +
    // TWO-LEVEL hash aggregate — (doc, word) counts get map-side partial
    // aggregation, the 10^12-doc scale shape; line stats are narrow array
    // HOFs over the planted contract text (which carries real newlines,
    // markdown tables and headings).
    "t05_repetition" -> q { d =>
      val ctext = Dialect.Ctext
      val w = s"regexp_extract_all(lower($ctext), '[a-z0-9]+', 0)"
      val rawLines =
        if (d.isSpark) s"split($ctext, '\\n')"
        else s"string_split_regex($ctext, '\\n')"
      val nel = d.lfilter(rawLines, "x -> x <> ''")
      val ldist = if (d.isSpark) "array_distinct" else "list_distinct"
      val joined =
        if (d.isSpark) "array_join(w, '')"
        else "coalesce(array_to_string(w, ''), '')"
      val un = if (d.isSpark) "explode(w)" else "unnest(w)"
      s"""WITH base AS (SELECT doc_id, $nel AS nel, $w AS w FROM documents),
         |wx AS (SELECT doc_id, $un AS word FROM base),
         |c AS (SELECT doc_id, word, count(*) AS cnt FROM wx GROUP BY doc_id, word),
         |wf AS (SELECT doc_id, sum(cnt) AS total, max(cnt) AS top_cnt, count(*) AS uniq FROM c GROUP BY doc_id),
         |lf AS (SELECT doc_id, ${d.size("nel")} AS n_lines,
         |  round(1e0 - ${d.size(s"$ldist(nel)")} * 1e0 / nullif(${d.size("nel")}, 0), 6) AS dup_line_frac,
         |  round(${d.size(d.lfilter("nel", "x -> x LIKE '|%' OR x LIKE '#%'"))} * 1e0 / nullif(${d.size("nel")}, 0), 6) AS markup_line_frac,
         |  round(length($joined) * 1e0 / nullif(${d.size("w")}, 0), 6) AS mean_word_len
         |  FROM base)
         |SELECT l.doc_id AS doc_id, l.n_lines, l.dup_line_frac, l.markup_line_frac, l.mean_word_len,
         |  round(f.top_cnt * 1e0 / nullif(f.total, 0), 6) AS top_word_frac,
         |  round(f.uniq * 1e0 / nullif(f.total, 0), 6) AS unique_word_frac,
         |  CASE WHEN f.top_cnt * 1e0 / nullif(f.total, 0) <= 0.2
         |        AND f.uniq * 1e0 / nullif(f.total, 0) >= 0.3
         |        AND l.dup_line_frac <= 0.3 THEN 1 ELSE 0 END AS keep
         |FROM lf l JOIN wf f ON l.doc_id = f.doc_id
         |ORDER BY l.doc_id""".stripMargin.replace("\n", " ")
    },

    // T4 — document fingerprint: md5 over normalized content
    "t04_fingerprint" -> q { d =>
      val norm = d.rr("lower(text)", "'[^a-z0-9]+'", "''")
      s"SELECT doc_id, md5($norm) AS fingerprint FROM documents ORDER BY doc_id"
    },

    // T9 — per-document character entropy over the alphanumeric alphabet
    // (Shannon H in nats): the classic gibberish / encoding-junk signal —
    // natural text sits near ~2.9-3.1 nats, base64/hex blobs and
    // repeated-char junk fall far outside. Char counts use the
    // length-minus-replace trick (36 narrow scalar exprs, fully
    // codegen'd, identical in both dialects — no per-char explode, so
    // the scan stays one narrow pass at any corpus size). Both engines
    // evaluate the same double math; round(4) absorbs ulp-level ln()
    // differences.
    "t09_char_entropy" -> q { _ =>
      val alphabet = ('a' to 'z') ++ ('0' to '9')
      val counts = alphabet.map(c =>
        s"length(lt) - length(replace(lt, '$c', '')) AS n_$c").mkString(", ")
      val total = alphabet.map(c => s"n_$c").mkString(" + ")
      val terms = alphabet.map(c =>
        s"CASE WHEN n_$c > 0 THEN (n_$c * 1e0 / n_total) * ln(n_$c * 1e0 / n_total) ELSE 0e0 END")
        .mkString(" + ")
      s"""WITH lowered AS (SELECT doc_id, lower(text) AS lt FROM documents),
         |cnt AS (SELECT doc_id, $counts FROM lowered),
         |tot AS (SELECT *, $total AS n_total FROM cnt)
         |SELECT doc_id, CAST(n_total AS INT) AS n_alnum,
         |  CASE WHEN n_total > 0 THEN round(-($terms), 4) ELSE 0e0 END AS entropy
         |FROM tot ORDER BY doc_id""".stripMargin.replace("\n", " ")
    },

    // D6 — embedding-cosine near-dup pairs, brute-force all-pairs: the
    // PARITY BASELINE by design (the scale path is the LSH-bucketed
    // x13_embed_neardup_lsh, which must recall-match this on planted
    // clones — OpsSpec). Threshold on the rounded value so the two
    // engines' float sums cannot straddle the cut.
    "d06_embed_neardup" -> q { d =>
      val sim =
        if (d.isSpark)
          """(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (p, q) -> p + q)
            | / (sqrt(aggregate(transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (p, q) -> p + q))
            |  * sqrt(aggregate(transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (p, q) -> p + q))))"""
            .stripMargin.replace("\n", " ")
        else "list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round($sim, 6) AS cos_sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE round($sim, 6) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin.replace("\n", " ")
    },

    // D12 — k-NN similarity JOIN, brute-force parity baseline (the
    // set-to-set form of v01: top-3 corpus neighbors for EVERY query row
    // vec_id < 20). The LSH-bucketed scale path is x21_knn_join_lsh
    // (Ann.knnJoin), recall-pinned in OpsSpec — at 10^12 rows only the
    // bucket equi-join form survives; this all-pairs twin is the
    // value-exact spec at test scale.
    "d12_knn_join" -> q { d =>
      val sim =
        if (d.isSpark)
          """(aggregate(zip_with(q.embedding, c.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (p, r) -> p + r)
            | / (sqrt(aggregate(transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (p, r) -> p + r))
            |  * sqrt(aggregate(transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (p, r) -> p + r))))"""
            .stripMargin.replace("\n", " ")
        else "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
      s"""SELECT query_id, neighbor_id, cos_sim FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($sim, 6) AS cos_sim,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY round($sim, 6) DESC, c.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20) x
         |WHERE rn <= 3 ORDER BY query_id, neighbor_id""".stripMargin.replace("\n", " ")
    },

    // V1 — brute-force cosine top-k against the vec_id=0 query embedding
    "v01_ann_topk" -> q { d =>
      val sim =
        if (d.isSpark)
          """(aggregate(zip_with(e.embedding, q.qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, b) -> a + b)
            | / (sqrt(aggregate(transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, b) -> a + b))
            |  * sqrt(aggregate(transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, b) -> a + b))))"""
            .stripMargin.replace("\n", " ")
        else "list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[])"
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, round($sim, 6) AS cos_sim
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 0
         |ORDER BY round($sim, 6) DESC, e.vec_id LIMIT 10""".stripMargin.replace("\n", " ")
    }
  )
}
