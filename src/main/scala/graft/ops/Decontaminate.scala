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

  /** Distinct (id, gram-hash) pairs for a document set. Ids are unique per
    * document (every caller's contract), so duplicate (id, gh) pairs can
    * only arise WITHIN one row — a per-row `array_distinct` before the
    * explode yields exactly the distinct pairs with NO exchange, where the
    * r6 form shuffled every gram row through a global `distinct()` (guide
    * §2.4: a distinct on data that is already unique across rows). */
  private def gramTable(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame =
    docs.select(col(idCol).as("id"), wordsOf(col(textCol)).as("w"))
      .select(col("id"),
        explode(array_distinct(gramsFromWords(col("w"), n))).as("gh"))

  /** Distinct bench-side gram hashes. The per-row array_distinct removes
    * within-doc repeats before the explode, so the global distinct's
    * exchange carries only cross-doc survivors (r7, guide §2.3). */
  private def benchGramSet(bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    bench.select(wordsOf(col(benchTextCol)).as("w"))
      .select(explode(array_distinct(gramsFromWords(col("w"), n))).as("gh"))
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
    // the filter sits on the per-row-distinct gram pairs (gramTable is
    // exchange-free since r7), still below any shuffle — pruning before
    // the join is the entire point
    gramTable(corpus, idCol, textCol, n)
      .filter(mightContain(col("gh")))
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
    val w = docs.select(col(idCol).as("id"), wordsOf(col(textCol)).as("w"))
    val tok = w.select(col("id"), posexplode(col("w")).as(Seq("pos", "word")))
    val grams = w.select(col("id"),
      posexplode(gramsFromWords(col("w"), n)).as(Seq("pos", "gh")))
    // per-doc-distinct pairs come from a per-row array_distinct (ids are
    // unique per doc), not a global distinct() — the r6 form shuffled
    // every positional gram row just to dedup within-doc repeats (r7,
    // guide §2.4); the groupBy(gh) below is the only exchange left here
    val shared = w.select(col("id"),
        explode(array_distinct(gramsFromWords(col("w"), n))).as("gh"))
      .groupBy("gh").agg(min("id").as("keeper"), count("*").as("nd"))
      .filter(col("nd") >= 2).select("gh", "keeper")
    // each (id, pos) carries exactly one gram, so this join cannot fan out
    val marked = grams.join(shared, "gh")
      .filter(col("id") =!= col("keeper"))
      .select(col("id"), col("pos"))
    rebuildWithoutMarked(docs.select(col(idCol).as("id")), tok, marked, n)
      .withColumnRenamed("id", idCol)
  }

  /** Shared tail of the span-removal forms: running-max interval coverage
    * over the marked gram starts (ONE window per doc), then the word-level
    * rebuild (per-doc hash agg over array_sort, no global sort). `tok` is
    * (id, pos, word); `marked` is (id, pos) gram starts to cut; `ids` the
    * doc universe. Output: (id, n_words, n_removed, text_clean). */
  private def rebuildWithoutMarked(ids: DataFrame, tok: DataFrame,
                                   marked: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cov = tok.join(marked.withColumn("mk", lit(true)), Seq("id", "pos"), "left")
      .withColumn("cov_end", max(when(col("mk"), col("pos") + n)).over(win))
    val kept = cov.filter(col("cov_end").isNull || col("cov_end") <= col("pos"))
    val nw = tok.groupBy("id").agg(count("*").cast("int").as("n_words"))
    val agg = kept.groupBy("id").agg(
      count("*").cast("int").as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("word")))),
        s => s.getField("word")), " ").as("text_clean"))
    ids.distinct()
      .join(nw, Seq("id"), "left")
      .join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_words"), lit(0)).as("n_words"),
        (coalesce(col("n_words"), lit(0)) - coalesce(col("n_kept"), lit(0)))
          .as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** The duplicated-gram index SERVED: the corpus side of `removeDupSpans`
    * as a build-once bucketed warehouse table of DISTINCT gram hashes, so
    * an incoming shard is scrubbed of corpus boilerplate with NO corpus
    * re-read — the probe streams the bucketed index with no exchange
    * (same layout contract as the served minhash index). */
  final case class GramIndex(grams: DataFrame, n: Int)

  /** The index's table triple plus the compaction stage names a crashed
    * maintenance run can leave behind. */
  private def gramIndexTables(table: String): Seq[String] =
    Seq("", "_params", "_epochs").flatMap(s =>
      Seq(s"$table$s", s"$table${s}_cstage"))

  /** Build the index of an existing corpus ONCE: one gram pass reduced to
    * distinct hashes, written bucketed+sorted by gh. */
  def writeGramIndex(docs: DataFrame, textCol: String,
                     table: String, n: Int = 13, nBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // true overwrite semantics (same contract as writeMinhashIndex): a
    // previous session's managed location must not block the rebuild
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    gramIndexTables(table).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(wh, t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    // a rebuild starts maintenance history over — a stale pending marker
    // would resurrect a dead stage over the fresh tables
    java.nio.file.Files.deleteIfExists(gramCompactMarker(spark, table))
    docs.select(wordsOf(col(textCol)).as("w"))
      .select(explode(array_distinct(gramsFromWords(col("w"), n))).as("gh"))
      .distinct()
      .withColumn("epoch", lit(0L))
      .write.mode("overwrite").bucketBy(nBuckets, "gh").sortBy("gh")
      .format("parquet").saveAsTable(table)
    Seq((n, nBuckets)).toDF("n", "n_buckets")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_params")
    Seq(Tuple1(0L)).toDF("epoch")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_epochs")
  }

  /** Fold an accepted shard's grams in as one epoch — a SHARD-scale gram
    * pass appended into the bucket layout (probes keep streaming the index
    * with no exchange). A gram already present under an earlier epoch
    * simply repeats; the semi/anti probes are set-semantics, so duplicate
    * rows cannot change any answer — `compactGramIndex` folds the
    * accumulated epochs (and the duplicate rows) into one distinct-gh
    * baseline. Replays are no-ops via the tiny epoch ledger, and stay
    * no-ops for folded epochs (their grams live on inside the baseline).
    * Single-writer contract as everywhere in the serving tier: one live
    * writer per table (see Dedup.appendToMinhashIndex). */
  def appendToGramIndex(shard: DataFrame, textCol: String,
                        table: String, epoch: Long): Unit = {
    val spark = shard.sparkSession
    import spark.implicits._
    require(epoch > 0L, s"epoch must be positive (0 is the base build): $epoch")
    finishPendingGramCompact(spark, table)
    refreshGramTables(spark, table)
    // a folded epoch's grams live on inside the baseline, so its replayed
    // append stays a no-op — set semantics make this exact, not lossy
    if (epoch <= gramMaxFoldedOf(spark.table(s"${table}_params").head()))
      return
    if (spark.table(s"${table}_epochs").filter(col("epoch") === epoch)
        .limit(1).count() > 0) return
    val p = spark.table(s"${table}_params").head()
    val (n, nBuckets) = (p.getInt(0), p.getInt(1))
    shard.select(wordsOf(col(textCol)).as("w"))
      .select(explode(array_distinct(gramsFromWords(col("w"), n))).as("gh"))
      .distinct()
      .withColumn("epoch", lit(epoch))
      .write.mode("append").bucketBy(nBuckets, "gh").sortBy("gh")
      .format("parquet").saveAsTable(table)
    Seq(Tuple1(epoch)).toDF("epoch")
      .write.mode("append").format("parquet").saveAsTable(s"${table}_epochs")
  }

  /** Same cross-session staleness hazard as the minhash index: the gram
    * table is appended to from other sessions (a streaming foreachBatch
    * runs in a CLONE), and a long-lived session caches a catalog table's
    * file listing on first touch — probes and the append's replay ledger
    * must re-list, not trust the cache. */
  private def refreshGramTables(spark: org.apache.spark.sql.SparkSession,
                                table: String): Unit =
    Seq(table, s"${table}_params", s"${table}_epochs").foreach { t =>
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
    }

  private def gramCompactMarker(spark: org.apache.spark.sql.SparkSession,
                                table: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      s"_compact_pending_$table")

  /** Params tables written before gram compaction existed lack the
    * max_folded_epoch column — read it tolerantly. */
  private def gramMaxFoldedOf(p: org.apache.spark.sql.Row): Long =
    if (p.schema.fieldNames.contains("max_folded_epoch"))
      p.getAs[Long]("max_folded_epoch")
    else -1L

  /** Gram-index maintenance — the same story as `compactMinhashIndex`:
    * every accepted shard appends its DISTINCT grams as an epoch, so at
    * shard-per-hour ingestion the bucketed table accretes files AND
    * duplicate gh rows (a keeper's gram that was already in the corpus
    * repeats under the new epoch — harmless to the set-semantics probes,
    * but paid on every scan forever). Compaction rewrites the table as
    * ONE distinct-gh baseline under the max folded epoch, keeping the
    * SAME bucket spec (the no-shuffle probe layout survives), collapses
    * the epoch ledger to the baseline row, and records the fold point in
    * the params table. Probes answer byte-identically; a folded epoch
    * can no longer be EXCLUDED (`openGramIndex(excludeEpoch)` refuses it
    * loudly — compact only while ingestion is quiescent), while a folded
    * epoch's replayed APPEND stays a correct no-op (its grams live on in
    * the baseline).
    *
    * Crash safety: stage tables first (invisible), then an atomically-
    * published marker makes the three-table swap recoverable; open and
    * append paths finish a crashed swap. */
  def compactGramIndex(spark: org.apache.spark.sql.SparkSession,
                       table: String): Long =
    compactGramIndexImpl(spark, table, crashBeforeSwap = false)

  /** `crashBeforeSwap` is a test seam: throw after the marker publishes
    * but before the swap — the worst crash point recovery must finish. */
  private[graft] def compactGramIndexImpl(
      spark: org.apache.spark.sql.SparkSession, table: String,
      crashBeforeSwap: Boolean): Long = {
    import spark.implicits._
    finishPendingGramCompact(spark, table)
    refreshGramTables(spark, table)
    val p = spark.table(s"${table}_params").head()
    val (n, nBuckets) = (p.getInt(0), p.getInt(1))
    val mf = gramMaxFoldedOf(p)
    val baseline = spark.table(s"${table}_epochs")
      .agg(max("epoch")).head().getLong(0)
    if (baseline <= mf) return mf // already compact
    spark.table(table).select("gh").distinct()
      .withColumn("epoch", lit(baseline))
      .write.mode("overwrite").bucketBy(nBuckets, "gh").sortBy("gh")
      .format("parquet").saveAsTable(s"${table}_cstage")
    Seq((n, nBuckets, baseline)).toDF("n", "n_buckets", "max_folded_epoch")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_params_cstage")
    Seq(Tuple1(baseline)).toDF("epoch")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_epochs_cstage")
    val marker = gramCompactMarker(spark, table)
    val tmp = java.nio.file.Paths.get(marker.toString + ".tmp")
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.writeString(tmp, table)
    java.nio.file.Files.move(tmp, marker,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    if (crashBeforeSwap)
      throw new IllegalStateException("test crash seam: before gram swap")
    finishPendingGramCompact(spark, table)
    baseline
  }

  /** Complete a compaction swap (idempotent — a missing stage means that
    * table's swap already happened). */
  private def finishPendingGramCompact(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val marker = gramCompactMarker(spark, table)
    if (!java.nio.file.Files.exists(marker)) return
    for (suffix <- Seq("", "_params", "_epochs")) {
      val (stage, dest) = (s"$table${suffix}_cstage", s"$table$suffix")
      if (spark.catalog.tableExists(stage)) {
        spark.sql(s"DROP TABLE IF EXISTS $dest")
        spark.sql(s"ALTER TABLE $stage RENAME TO $dest")
      }
    }
    java.nio.file.Files.deleteIfExists(marker)
    ()
  }

  /** `excludeEpoch` is the streaming-replay view: gram rows THIS batch's
    * crashed accept may already have appended are filtered out, so a
    * replayed scrub sees the exact pre-accept index (without it, a
    * replayed keeper would find its own grams indexed and scrub itself
    * to nothing). An epoch already folded by `compactGramIndex` cannot
    * be excluded — refused loudly (quiescence contract). */
  def openGramIndex(spark: org.apache.spark.sql.SparkSession,
                    table: String,
                    excludeEpoch: Option[Long] = None): GramIndex = {
    finishPendingGramCompact(spark, table)
    refreshGramTables(spark, table)
    val p = spark.table(s"${table}_params").head()
    excludeEpoch.foreach(e => require(e > gramMaxFoldedOf(p),
      s"excludeEpoch=$e was folded by gram-index compaction " +
        s"(max_folded_epoch=${gramMaxFoldedOf(p)}); its rows are " +
        "indistinguishable inside the baseline — compact only while " +
        "ingestion is quiescent"))
    val g = spark.table(table)
    val gf = excludeEpoch.map(e => g.filter(col("epoch") =!= e)).getOrElse(g)
    GramIndex(gf.select("gh"), p.getInt(0))
  }

  /** `removeDupSpans` for an incoming shard against a WRITTEN gram index —
    * the incremental-pipeline form: per-shard cost is shard-scale, the
    * corpus appears only as the bucketed index probe. Corpus seniority: a
    * shard position whose gram is in the index is cut unconditionally
    * (the keeper lives in the corpus); grams unknown to the index fall
    * back to the in-shard min-id keeper rule. CONTRACT: shard ids must be
    * larger than every indexed doc's id — then the output is value-equal
    * to running `removeDupSpans` over corpus ∪ shard and keeping the
    * shard rows (x41 pins exactly that against the DuckDB full-run twin).
    * Plan: two probes of the index (left-semi for hits, left-anti for the
    * in-shard tier) — both stream the bucketed table with no exchange on
    * the index side; only shard-scale rows shuffle. */
  def removeDupSpansServed(shard: DataFrame, idCol: String, textCol: String,
                           index: GramIndex): DataFrame = {
    val w = shard.select(col(idCol).as("id"), wordsOf(col(textCol)).as("w"))
    val tok = w.select(col("id"), posexplode(col("w")).as(Seq("pos", "word")))
    val marked = servedMarked(w, index)
    rebuildWithoutMarked(shard.select(col(idCol).as("id")), tok, marked,
        index.n)
      .withColumnRenamed("id", idCol)
  }

  /** The served marked-position computation shared by the normalized and
    * the text-preserving rebuilds. `w` is (id, w: array<string>) of
    * normalized words; returns (id, pos) gram starts to cut. */
  private def servedMarked(w: DataFrame, index: GramIndex): DataFrame = {
    val grams = w.select(col("id"),
      posexplode(gramsFromWords(col("w"), index.n)).as(Seq("pos", "gh")))
    // the index may hold duplicate gh rows across epochs — semi/anti are
    // the fan-out-proof probes (a left join would multiply positions)
    val hit = grams.join(index.grams, Seq("gh"), "left_semi")
      .select("id", "pos")
    val miss = grams.join(index.grams, Seq("gh"), "left_anti")
    val sharedShard = miss.select("id", "gh").distinct()
      .groupBy("gh").agg(min("id").as("keeper"), count("*").as("nd"))
      .filter(col("nd") >= 2).select("gh", "keeper")
    val shardMarked = miss.join(sharedShard, "gh")
      .filter(col("id") =!= col("keeper"))
      .select("id", "pos")
    // disjoint by construction (semi vs anti on the same probe)
    hit.union(shardMarked)
  }

  /** Codepoint start offsets (0-based) of the alnum word runs in a text —
    * the bridge from normalized word POSITIONS back to ORIGINAL character
    * spans. A loopy regex scan with no Catalyst equivalent (one matcher
    * pass per row, narrow); offsets are codepoints, not UTF-16 units, so
    * they line up with Spark's substring semantics on any text. */
  private val runStartsUdf = udf { s: String =>
    if (s == null) Array.empty[Int]
    else {
      val m = java.util.regex.Pattern.compile("[a-zA-Z0-9]+").matcher(s)
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var lastChar = 0; var lastCp = 0
      while (m.find()) {
        lastCp += s.codePointCount(lastChar, m.start()); lastChar = m.start()
        b += lastCp
      }
      b.toArray
    }
  }

  /** `removeDupSpansServed` with the ORIGINAL text preserved — the form
    * the curation loop serves (Curation.scrubShard). The normalized
    * rebuild is right for the gram algebra (x39/x41 pin it value-exact)
    * but wrong as the surviving DOCUMENT: lowercasing and
    * punctuation-stripping every shard doc shifts quality-probe / LM
    * features off their raw-corpus training distribution (train/serve
    * skew) and persists a mangled corpus. Here:
    *   - a doc with NOTHING removed passes through VERBATIM (byte-equal);
    *   - a doc with removed spans is rebuilt from original codepoint
    *     slices: kept word `i` contributes text[start(i), start(i+1))
    *     (its run plus the punctuation/whitespace up to the next word;
    *     the last word runs to end-of-text), so case and punctuation
    *     survive on all kept content — RefinedWeb-style span removal
    *     keeps the surviving original text intact;
    *   - a full clone of indexed content still rebuilds to "".
    * Invariant (spec-pinned): normalizing the preserved rebuild yields
    * exactly the words of the normalized rebuild, so every downstream
    * gram/minhash consumer sees identical keys either way.
    * Output: (idCol, n_words, n_removed, text_clean). */
  def removeDupSpansServedPreserving(shard: DataFrame, idCol: String,
                                     textCol: String,
                                     index: GramIndex): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = index.n
    val w = shard.select(col(idCol).as("id"), wordsOf(col(textCol)).as("w"))
    val tok = w.select(col("id"), posexplode(col("w")).as(Seq("pos", "word")))
    val marked = servedMarked(w, index)
    val win = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cov = tok
      .join(marked.withColumn("mk", lit(true)), Seq("id", "pos"), "left")
      .withColumn("cov_end", max(when(col("mk"), col("pos") + n)).over(win))
    val kept = cov.filter(col("cov_end").isNull || col("cov_end") <= col("pos"))
    val nw = tok.groupBy("id").agg(count("*").cast("int").as("n_words"))
    val keptAgg = kept.groupBy("id")
      .agg(sort_array(collect_list("pos")).as("kp"))
    shard.select(col(idCol).as("id"), col(textCol).as("_text")).distinct()
      .join(nw, Seq("id"), "left")
      .join(keptAgg, Seq("id"), "left")
      // bind per-row scalars OUTSIDE the transform lambda (a free
      // expression is re-evaluated per element)
      .withColumn("_starts", runStartsUdf(col("_text")))
      .withColumn("_nst", size(col("_starts")))
      .withColumn("_tlen", length(col("_text")))
      .select(col("id"),
        coalesce(col("n_words"), lit(0)).as("n_words"),
        (coalesce(col("n_words"), lit(0)) -
          coalesce(size(col("kp")), lit(0))).as("n_removed"),
        when(coalesce(col("n_words"), lit(0)) ===
            coalesce(size(col("kp")), lit(0)),
          coalesce(col("_text"), lit("")))             // untouched: verbatim
          .otherwise(regexp_replace(regexp_replace(
            array_join(transform(
              coalesce(col("kp"), expr("CAST(array() AS ARRAY<INT>)")),
              p => col("_text").substr(
                element_at(col("_starts"), p + 1) + 1,
                when(p + 2 <= col("_nst"), element_at(col("_starts"), p + 2))
                  .otherwise(col("_tlen"))
                  - element_at(col("_starts"), p + 1))), ""),
            "^\\s+", ""), "\\s+$", ""))
          .as("text_clean"))
      .withColumnRenamed("id", idCol)
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
