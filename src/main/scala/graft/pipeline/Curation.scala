package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Decontaminate, Dedup, Lm, Mix, Probe}

/** The round's serving structures composed into the incremental curation
  * loop a 100 TB pipeline actually runs: bootstrap the persisted state
  * once from the existing corpus, then for every incoming shard decide
  * per document — without ever re-reading the corpus text except for
  * id-selective near-dup verification — and fold the keepers back in.
  *
  * Decision order (first hit wins, mirroring the d11 layer):
  *   1. exact_dup      in-shard md5 content key, keeper = min doc_id
  *                     (a corpus-level exact clone is a jaccard-1.0 pair
  *                     the minhash probe catches as near_dup);
  *   2. near_dup       minhash-index candidates (shard-vs-corpus AND
  *                     shard-vs-shard, combined bucket cap at probe time)
  *                     verified by word-set jaccard — the loser is the
  *                     shard doc against any corpus partner (corpus
  *                     seniority), or the larger id of a shard pair;
  *   3. contaminated   13-gram overlap with the benchmark set;
  *   4. gibberish      the SERVED bigram LM's out-of-distribution gate
  *                     (doc scores strictly below its language's training
  *                     minimum — encoding junk / consonant salad);
  *   5. low_quality    the SERVED probe's decision (persisted model, one
  *                     aggregate-free pass);
  *   6. keep           with n_copies from the SERVED mix rates as of the
  *                     pre-accept stats.
  * `acceptShard` folds the keepers into the minhash index and the domain
  * stats as one epoch (the probe and LM models retrain on a schedule,
  * not per shard). Per-shard cost is shard-scale everywhere: the corpus
  * appears only as the bucketed index probe and the id-selective text
  * fetch for jaccard verification. */
object Curation {

  /** The persisted serving state one curated corpus keeps. `gramTable`
    * (optional) adds the served duplicated-gram index: shards are then
    * SCRUBBED of corpus boilerplate before any decision — the
    * RefinedWeb order (boilerplate removal first, dedup on content) —
    * and accepted keepers fold their grams back in. */
  final case class Indexes(minhashTable: String, statsPath: String,
                           modelPath: String, lmPath: String,
                           gramTable: Option[String] = None)

  /** Build all serving state ONCE from the existing corpus (which must
    * carry doc_id, text, source AND lang — the LM is per-language).
    * A state with NO gram table runs the loop scrub-less — that is a
    * contract choice, not a silent default: bootstrap says so on stderr,
    * and a caller that considers the scrub part of the loop's contract
    * passes `requireScrub = true` to fail loudly instead (the same
    * interlock discipline as every other serving table). */
  def bootstrap(corpus: DataFrame, ixs: Indexes,
                requireScrub: Boolean = false): Unit = {
    require(!requireScrub || ixs.gramTable.nonEmpty,
      "requireScrub: this curation state has no gram table — the loop " +
        "would run WITHOUT the pre-decision boilerplate scrub; set " +
        "Indexes.gramTable or drop requireScrub")
    if (ixs.gramTable.isEmpty)
      System.err.println("[curation] bootstrap without a gram table: the " +
        "loop runs SCRUB-LESS (no pre-decision duplicated-span removal)")
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", ixs.minhashTable)
    Mix.writeStats(corpus, ixs.statsPath)
    Probe.writeModel(corpus, ixs.modelPath)
    Lm.writeModel(corpus, ixs.lmPath)
    ixs.gramTable.foreach(t =>
      Decontaminate.writeGramIndex(corpus, "text", t))
  }

  /** The pre-decision scrub: duplicated-span removal against the served
    * gram index — corpus boilerplate (licence headers, templated chrome)
    * vanishes from shard docs BEFORE dedup/quality/mix look at them, so
    * every downstream decision acts on content, not chrome. Uses the
    * TEXT-PRESERVING rebuild: an untouched doc passes through verbatim
    * and a scrubbed doc keeps original case/punctuation on surviving
    * content — the probe and LM were fitted on raw corpus text, so the
    * normalized rebuild would shift every served feature off the
    * training distribution (train/serve skew), and keepers would persist
    * mangled text into the curated corpus. A full clone of indexed text
    * still scrubs to empty and falls to the quality gate — the
    * degenerate case is still caught, just under a different label.
    * No-op when the state has no gram index. `excludeEpoch` is the
    * streaming-replay view (see `Decontaminate.openGramIndex`). */
  def scrubShard(spark: SparkSession, shard: DataFrame, ixs: Indexes,
                 excludeEpoch: Option[Long] = None): DataFrame =
    ixs.gramTable match {
      case None => shard
      case Some(t) =>
        val idx = Decontaminate.openGramIndex(spark, t, excludeEpoch)
        val clean = Decontaminate
          .removeDupSpansServedPreserving(shard, "doc_id", "text", idx)
          .select(col("doc_id"), col("text_clean"))
        shard.drop("text").join(clean, "doc_id")
          .withColumnRenamed("text_clean", "text")
    }

  /** Curate one shard: per shard doc (doc_id, decision, score, n_copies).
    * `corpus` supplies text for jaccard verification only — the join is
    * candidate-id-selective, never a corpus scan. CONTRACT: `corpus` must
    * hold text for EVERY doc the minhash index knows — i.e. the caller's
    * corpus table as grown by accepted shards (accept = append keepers to
    * the corpus table AND fold the indexes; a candidate pair whose
    * partner text is missing cannot be verified and is dropped). Shard
    * ids must be disjoint from corpus ids (the index contract). */
  def curateShard(spark: SparkSession, shard: DataFrame, corpus: DataFrame,
                  ixs: Indexes, bench: DataFrame, benchTextCol: String,
                  jaccardThreshold: Double = 0.5,
                  maxBucket: Int = 1000,
                  excludeEpoch: Option[Long] = None,
                  droppedRows: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    // excludeEpoch: the streaming-replay contract — ignore serving-state
    // rows THIS batch's crashed accept attempt may already have appended
    // (minhash index epoch + mix-stats epoch), so a replay recomputes
    // decisions against the exact pre-accept state (StreamingCuration)
    val ids = shard.select(col("doc_id"))
    // 1. in-shard exact dup: d01/d11 content key, min id keeps
    val exactLosers = shard
      .select(col("doc_id"), md5(expr("substr(text, 1, 24)")).as("key"))
      .withColumn("keeper", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), lit(true).as("is_exact"))
    // 2. near dup: index probe -> jaccard verify on shard+corpus texts
    val idx = Dedup.openMinhashIndex(spark, ixs.minhashTable)
    // droppedRows surfaces the bucket-cap coverage loss: a viral-bucket
    // corpus would otherwise read as "no near-dups in this shard" with no
    // signal (the count is added eagerly here, at probe-build time)
    val cands = Dedup.incrementalCandidates(shard, "doc_id", "text", idx,
      maxBucket = maxBucket, droppedRows = droppedRows,
      excludeEpoch = excludeEpoch)
    val texts = shard.select(col("doc_id"), col("text"))
      .unionByName(corpus.select(col("doc_id"), col("text")))
    val verified = Dedup.jaccardOnCandidates(texts, cands, "doc_id", "text",
      jaccardThreshold)
    val inShard = ids.withColumnRenamed("doc_id", "sid")
    val nearLosers = verified
      .join(broadcast(inShard.withColumnRenamed("sid", "a_s")),
        col("doc_a") === col("a_s"), "left")
      .join(broadcast(inShard.withColumnRenamed("sid", "b_s")),
        col("doc_b") === col("b_s"), "left")
      .select(when(col("a_s").isNotNull && col("b_s").isNotNull,
          greatest(col("doc_a"), col("doc_b")))          // shard pair: larger loses
        .when(col("a_s").isNotNull, col("doc_a"))        // corpus partner: shard loses
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
      .withColumn("is_near", lit(true))
    // 3. benchmark contamination (13-gram rule)
    val contam = Decontaminate.contaminated(shard, "doc_id", "text",
        bench, benchTextCol)
      .select(col("doc_id"), lit(true).as("is_contam"))
    // 4. served LM gibberish gate; 5. served quality probe;
    // 6. served mix copy counts
    val lmGate = Lm.gate(shard, Lm.openModel(spark, ixs.lmPath))
      .select(col("doc_id"), col("lm_score"), col("lm_ok"))
    val scored = Probe.score(shard, Probe.openModel(spark, ixs.modelPath))
      .select(col("doc_id"), col("score"), col("pred"))
    val stats = excludeEpoch match {
      case Some(e) => Mix.openStatsExcluding(spark, ixs.statsPath, e)
      case None => Mix.openStats(spark, ixs.statsPath)
    }
    val mixed = Mix.assign(shard, Mix.rates(stats))
      .select(col("doc_id"), col("n_copies"))
    ids
      .join(exactLosers, Seq("doc_id"), "left")
      .join(nearLosers, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .join(lmGate, Seq("doc_id"), "left")
      .join(scored, Seq("doc_id"), "left")
      .join(mixed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact"), "exact_dup")
          .when(col("is_near"), "near_dup")
          .when(col("is_contam"), "contaminated")
          .when(col("lm_ok") === false, "gibberish")
          .when(col("pred") === 0, "low_quality")
          .otherwise("keep").as("decision"),
        col("score"), col("lm_score"),
        // a keeper from a domain the stats have never seen (Mix.assign
        // inner-joins the rates) defaults to one copy — new domains enter
        // at natural rate until the next accept folds them into the stats
        when(col("is_exact").isNotNull || col("is_near").isNotNull ||
            col("is_contam").isNotNull || col("lm_ok") === false ||
            col("pred") === 0, 0)
          .otherwise(coalesce(col("n_copies"), lit(1))).as("n_copies"))
  }

  /** The drift tier CLOSED into a loop: check both model alarms on a
    * shard and ACT on whichever fires — refit on the grown corpus and
    * swap the served model crash-safely (versioned pointer publish, see
    * `graft.io.Models`). Call AFTER `acceptShard`, passing the corpus as
    * grown — the retrain's reference distribution is the corpus the
    * models now gate, including the distribution shift that fired the
    * alarm (the FineWeb/CCNet posture: the classifier/LM refit on a
    * fresh tranche of what the pipeline actually ingests).
    *
    * Alarm semantics are the models' own: the probe fires on shard
    * keep-rate divergence (and on an EMPTY shard — a defined upstream
    * signal; the refit it triggers is harmless), the LM fires per
    * language on the below-cut fraction. `sampleN` forwards to the probe
    * refit (24-pass GD on 100 TB wants the sampled bootstrap).
    *
    * Returns the 2-row report (model, fired, version): `version` is the
    * newly published model version, or the unchanged current version
    * when the alarm was quiet. Single-writer, quiescent-loop contract —
    * retrain swaps state the loop reads, same discipline as compaction. */
  def retrainIfDrifted(spark: SparkSession, shard: DataFrame,
                       corpus: DataFrame, ixs: Indexes,
                       probeTol: Double = 0.15, lmRetrainFrac: Double = 0.1,
                       sampleN: Option[Long] = None): DataFrame = {
    val probeFire = Probe
      .driftStats(shard, Probe.openModel(spark, ixs.modelPath), probeTol)
      .select("retrain").head().getBoolean(0)
    val probeV =
      if (probeFire) Probe.retrainModel(corpus, ixs.modelPath, sampleN)
      else graft.io.Models.current(ixs.modelPath)
    // an empty shard yields ZERO per-language rows — max(retrain) over
    // nothing is null; coalesce keeps "no languages delivered" from
    // reading as an LM alarm (the probe's n_docs=0 rule owns that signal)
    val lmFire = Lm
      .driftStats(shard, Lm.openModel(spark, ixs.lmPath), lmRetrainFrac)
      .agg(coalesce(max("retrain"), lit(false)).as("fired"))
      .head().getBoolean(0)
    val lmV =
      if (lmFire) Lm.retrainModel(corpus, ixs.lmPath)
      else graft.io.Models.current(ixs.lmPath)
    import spark.implicits._
    Seq(("probe", probeFire, probeV), ("lm", lmFire, lmV))
      .toDF("model", "fired", "version")
  }

  /** Fold an accepted shard's keepers into the serving state as one
    * epoch: the minhash index grows (future shards dedup against these
    * docs) and the domain stats shift the mix. Both appends are
    * replay-idempotent under the same epoch. Single-writer contract:
    * one live accept loop per serving state (the streaming checkpoint is
    * the owner lock in deployment) — idempotence covers crashed-writer
    * replays, not two concurrent writers racing the same epoch. */
  def acceptShard(keepers: DataFrame, ixs: Indexes, epoch: Long): Unit = {
    Dedup.appendToMinhashIndex(keepers, "doc_id", "text", ixs.minhashTable,
      epoch)
    Mix.appendStats(keepers, ixs.statsPath, epoch)
    // when the loop scrubs, the keepers arrive ALREADY scrubbed — the
    // gram index grows with their surviving content, so the NEXT shard's
    // scrub also cuts spans duplicated against these accepts
    ixs.gramTable.foreach(t =>
      Decontaminate.appendToGramIndex(keepers, "text", t, epoch))
  }
}
