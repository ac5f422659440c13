package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any word
  * n-gram with a benchmark/eval set — the GPT-3 appendix-C / The-Pile
  * 13-gram overlap rule every serious training-data pipeline runs before
  * training. (The reference has no eval-set hygiene; this extends its
  * corpus tooling the way the dedup tier does.)
  *
  * Scale shape: both sides reduce to (gram-hash) keys BEFORE the wide op —
  * the corpus side shuffles distinct (doc_id, hash) pairs (≤ words-per-doc
  * longs, never text), the bench side distinct hashes only. Overlap is a
  * hash equi-join + hash agg; with a small bench side Catalyst/AQE
  * broadcasts it (no shuffle of the corpus at all). The oracle-exact SQL
  * twin for small literal benches is d09_decontaminate (substring form);
  * DecontaminateSpec pins this operator against a brute-force gram
  * intersect on real corpus samples.
  */
object Decontaminate {

  /** Normalized word array: lowercase, alnum runs only. */
  private def wordsOf(textCol: Column): Column =
    filter(split(lower(regexp_replace(textCol, "[^a-zA-Z0-9]+", " ")), " "),
      w => length(w) > 0)

  /** n-gram hashes over an already-materialized word-array COLUMN. The
    * words must be a bound column, not an inline expression: Catalyst
    * inlines a free expression into the transform lambda and re-evaluates
    * it per gram — the regexp+split would run O(grams) times per row
    * (measured 23.6 s -> 1.6 s at sf0.1 for the bound form). */
  private def gramsFromWords(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => xxhash64(array_join(slice(w, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<bigint>"))

  /** All word n-grams of a text column as xxhash64 keys (empty when the
    * text has fewer than n words). Pure array HOFs — narrow, codegen'd. */
  def gramHashes(textCol: Column, n: Int): Column =
    gramsFromWords(wordsOf(textCol), n)

  /** Raw (id, gram-hash) rows, pre-distinct — the seam where a
    * pre-exchange filter (bloom) can prune before any shuffle. */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol).as("id"), wordsOf(col(textCol)).as("w"))
      .select(col("id"), explode(gramsFromWords(col("w"), n)).as("gh"))

  /** Distinct (id, gram-hash) pairs for a document set. */
  private def gramTable(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame =
    gramRows(docs, idCol, textCol, n).distinct()

  /** Distinct bench-side gram hashes. */
  private def benchGramSet(bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    bench.select(wordsOf(col(benchTextCol)).as("w"))
      .select(explode(gramsFromWords(col("w"), n)).as("gh"))
      .distinct()

  /** Corpus documents contaminated by the bench set: one row per flagged
    * doc with the number of distinct overlapping n-grams.
    * Output: (idCol, n_hits). */
  def contaminated(corpus: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String,
                   n: Int = 13): DataFrame = {
    require(n >= 2, s"n=$n: a 1-gram overlap check flags any shared word — " +
      "use a real n-gram width (GPT-3 used 13)")
    gramTable(corpus, idCol, textCol, n)
      .join(benchGramSet(bench, benchTextCol, n), "gh")
      .groupBy(col("id").as(idCol))
      .agg(count("*").cast("int").as("n_hits"))
  }

  /** `contaminated` with a BLOOM pre-filter on the corpus side — the
    * runtime-filter shape for when the bench/eval set is too large to
    * broadcast (say 10^8 grams from a full eval-suite sweep): without it,
    * the join sort-merges and EVERY corpus gram hash shuffles — at 10^12
    * docs that shuffle dwarfs the real overlap, which is near-empty by
    * construction. A bloom over the bench gram hashes (~1.2 GB at 10^9
    * entries / 1% fpp, ~10-20x smaller than a hash relation) broadcasts
    * where the exact set cannot, and the corpus side drops non-candidate
    * grams BEFORE its exchange; false positives die in the exact join
    * that follows, so the result is row-identical to `contaminated`
    * (spec-pinned, and x33 pins it against the same DuckDB oracle as
    * x18). `expectedBenchGrams` sizes the filter without an extra
    * counting pass when the caller knows the bench scale (same hint
    * pattern as Ann.hashSample); <= 0 counts. The probe is a Scala UDF
    * because Spark exposes no public might_contain — one primitive-long
    * call per gram, applied only on the pre-exchange map side. */
  def contaminatedPrefiltered(corpus: DataFrame, idCol: String, textCol: String,
                              bench: DataFrame, benchTextCol: String,
                              n: Int = 13, fpp: Double = 0.01,
                              expectedBenchGrams: Long = -1L): DataFrame = {
    require(n >= 2, s"n=$n: a 1-gram overlap check flags any shared word — " +
      "use a real n-gram width (GPT-3 used 13)")
    val bg = benchGramSet(bench, benchTextCol, n)
    val expected = if (expectedBenchGrams > 0L) expectedBenchGrams
      else math.max(bg.count(), 1L)
    val bloom = bg.stat.bloomFilter("gh", expected, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((gh: Long) => bc.value.mightContainLong(gh))
    // the filter sits on the RAW gram rows, below the distinct's
    // exchange — pruning before any shuffle is the entire point
    gramRows(corpus, idCol, textCol, n)
      .filter(mightContain(col("gh")))
      .distinct()
      .join(bg, "gh")
      .groupBy(col("id").as(idCol))
      .agg(count("*").cast("int").as("n_hits"))
  }

  /** Cross-document duplicated-gram score — the INTRA-corpus twin of
    * `overlapScore` (ExactSubstr-style boilerplate detection at gram
    * granularity, after Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): for every doc, the count and fraction of
    * its distinct n-grams that also appear in at least one OTHER
    * document. High ratios flag licence headers, templated boilerplate,
    * and near-copies that survived doc-level dedup.
    *
    * Scale shape: the (id, gram-hash) table's closing distinct() is an
    * exchange both consumers (the ≥2-doc gram aggregate and the probe)
    * reuse, so the expensive gram derivation runs once; everything
    * downstream is gh-keyed hash aggs + an equi-join, then the id-keyed
    * reattach. Output: (idCol, n_grams, n_dup, dup_ratio). */
  def selfDupScore(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 13): DataFrame = {
    require(n >= 2, s"n=$n: a 1-gram rule flags any shared word — " +
      "use a real n-gram width")
    val grams = gramTable(docs, idCol, textCol, n)
    // a gram's doc count needs distinct docs — gramTable is already
    // distinct on (id, gh), so count(*) per gh IS the doc count
    val shared = grams.groupBy("gh").agg(count("*").as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("gh"), lit(1).as("_dup"))
    val scored = grams.join(shared, Seq("gh"), "left")
      .groupBy(col("id"))
      .agg(count("*").cast("int").as("n_grams"),
        coalesce(sum("_dup"), lit(0L)).cast("int").as("n_dup"))
    docs.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        coalesce(col("n_dup"), lit(0)).as("n_dup"))
      .withColumn("dup_ratio",
        round(col("n_dup") * lit(1e0) / greatest(col("n_grams"), lit(1)), 6))
  }

  /** ExactSubstr-style duplicated-span REMOVAL — the action form of
    * `selfDupScore` (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): every word n-gram appearing in ≥ 2
    * documents keeps its occurrences only in the smallest doc_id that
    * contains it; in every other document the words covered by such a
    * gram are cut out and the text is rebuilt from the surviving words.
    * Doc-level dedup falls out as the degenerate case (a full clone of a
    * smaller id empties); the common case is surgical — licence headers,
    * templated boilerplate, and quoted passages vanish from the copies
    * while the keeper and all unique prose survive verbatim.
    *
    * Output text is word-normalized (lowercased alnum runs joined by one
    * space — the same C4-style normalization every gram consumer here
    * uses); n_removed counts cut words. Deterministic: the keeper rule is
    * min(id), no RNG, no floats.
    *
    * Scale shape: tokens and grams are one narrow explode each (words
    * bound BEFORE the gram lambda — the O(grams) re-evaluation trap);
    * shared-gram resolution is a gh-keyed hash agg; marked positions come
    * back through a gh equi-join; coverage is ONE window per doc (running
    * max of marked-interval ends — never an interval theta-join); the
    * rebuild is a per-doc hash agg over an array_sort, not a global sort.
    * Per-doc window state is bounded by words-per-doc, the same
    * mega-doc-salting assumption as the rest of the span tier.
    * Output: (idCol, n_words, n_removed, text_clean). */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 13): DataFrame = {
    require(n >= 2, s"n=$n: a 1-gram rule removes any shared word — " +
      "use a real n-gram width")
    import org.apache.spark.sql.expressions.Window
    val w = docs.select(col(idCol).as("id"), wordsOf(col(textCol)).as("w"))
    val tok = w.select(col("id"), posexplode(col("w")).as(Seq("pos", "word")))
    val grams = w.select(col("id"),
      posexplode(gramsFromWords(col("w"), n)).as(Seq("pos", "gh")))
    val shared = grams.select("id", "gh").distinct()
      .groupBy("gh").agg(min("id").as("keeper"), count("*").as("nd"))
      .filter(col("nd") >= 2).select("gh", "keeper")
    // each (id, pos) carries exactly one gram, so this join cannot fan out
    val marked = grams.join(shared, "gh")
      .filter(col("id") =!= col("keeper"))
      .select(col("id"), col("pos"), lit(true).as("mk"))
    val win = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cov = tok.join(marked, Seq("id", "pos"), "left")
      .withColumn("cov_end", max(when(col("mk"), col("pos") + n)).over(win))
    val kept = cov.filter(col("cov_end").isNull || col("cov_end") <= col("pos"))
    val nw = tok.groupBy("id").agg(count("*").cast("int").as("n_words"))
    val agg = kept.groupBy("id").agg(
      count("*").cast("int").as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("word")))),
        s => s.getField("word")), " ").as("text_clean"))
    docs.select(col(idCol).as("id")).distinct()
      .join(nw, Seq("id"), "left")
      .join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_words"), lit(0)).as("n_words"),
        (coalesce(col("n_words"), lit(0)) - coalesce(col("n_kept"), lit(0)))
          .as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Graded form of `contaminated`: EVERY corpus doc scored with its
    * distinct-gram count, the distinct overlapping-gram count, and the
    * overlap ratio — the threshold-based filtering shape (drop when
    * ratio > tau) real pipelines prefer over the boolean rule, and the
    * observability row for tuning tau. Docs with fewer than n words have
    * zero grams and score 0. Same scale shape as `contaminated` (both
    * sides reduce to gram hashes before the join; bench side
    * broadcast-able) plus one hash agg and a final id-keyed left join to
    * reattach gram-free docs. Output: (idCol, n_grams, n_hits,
    * overlap_ratio). */
  def overlapScore(corpus: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String,
                   n: Int = 13): DataFrame = {
    require(n >= 2, s"n=$n: a 1-gram overlap check flags any shared word — " +
      "use a real n-gram width (GPT-3 used 13)")
    val scored = gramTable(corpus, idCol, textCol, n)
      .join(benchGramSet(bench, benchTextCol, n).withColumn("_hit", lit(1)),
        Seq("gh"), "left")
      .groupBy(col("id"))
      .agg(count("*").cast("int").as("n_grams"),
        coalesce(sum("_hit"), lit(0L)).cast("int").as("n_hits"))
    corpus.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        coalesce(col("n_hits"), lit(0)).as("n_hits"))
      .withColumn("overlap_ratio",
        round(col("n_hits") * lit(1e0) / greatest(col("n_grams"), lit(1)), 6))
  }
}
