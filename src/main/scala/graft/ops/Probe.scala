package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Dialect, TrainingQueries}

/** The quality probe SERVED: train once, persist the model, score every
  * incoming shard with one narrow pass.
  *
  * `t13_quality_probe` trains and scores in a single query — right for the
  * oracle gate, wrong for deployment: at 100 TB the classifier is fitted
  * once (on a tranche) and then applied to every shard the pipeline
  * ingests, without re-running the 24-iteration GD chain per decision.
  * `train` executes the SAME Spark-rendered training SQL as t13
  * (`TrainingQueries.probeModelSql`) and persists the five-number model
  * (cut, b, w1..w3); `score` broadcasts the model frame into the
  * feature pass rendered from the same `ProbeSql` builders — so a served
  * score is value-identical to the in-query run, and x37 pins that
  * against t13's own DuckDB oracle.
  */
object Probe {
  private val Sp = Dialect.Spark

  /** See Mix.parserParity — the shared expression strings carry regex
    * literals that parse verbatim only under escapedStringLiterals. */
  private def parserParity(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")

  /** Fit the probe on a training tranche: runs the full fixed-point GD
    * chain ONCE and returns the 1-row model frame (cut, b, w1, w2, w3).
    * Registers the tranche as the `documents` view the training SQL
    * reads — same per-call registration contract as the SQL tier. */
  def train(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    parserParity(spark)
    docs.createOrReplaceTempView("documents")
    spark.sql(TrainingQueries.probeModelSql(Sp) +
      " SELECT cut, b, w1, w2, w3 FROM cut")
  }

  /** Persist the trained model beside the data it will gate — plus the
    * TRAINING keep rate (fraction of training docs the fitted model
    * keeps), the reference point `driftStats` compares shards against.
    * The model frame is materialized once so the rate pass doesn't rerun
    * the GD chain. The write is a BOOTSTRAP: version history starts over
    * at v0 under the `graft.io.Models` pointer layout (readers
    * dereference `path/CURRENT`; a crashed write is invisible).
    *
    * `sampleN`: fit on an unbiased seeded hash-sample of ~sampleN docs
    * instead of the full corpus — the FineWeb/DCLM posture. The exact GD
    * chain is 24 FULL corpus scans; at 100 TB that is 24 passes to fit
    * five numbers, while the classifier literature trains on a small
    * sample. The sample is `xxhash64(doc_id, salt) % m == 0` (same
    * id-prefix-bias-free filter as Ann.hashSample), so retrains are
    * deterministic per (corpus, sampleN, nHint) and the sample is
    * distribution-faithful; train_keep_rate is measured on the same
    * sample (it IS the training distribution driftStats compares
    * against). Default None keeps the exact full-batch fit — the
    * x37-pinned path — byte-identical. `nHint` skips the sizing count
    * when the caller already knows the corpus size to order of
    * magnitude. */
  def writeModel(docs: DataFrame, path: String,
                 sampleN: Option[Long] = None, nHint: Long = -1L): Unit = {
    graft.io.Models.reset(path)
    fitTo(docs, s"$path/v0", sampleN, nHint)
    graft.io.Models.publish(path, 0L)
  }

  /** The drift alarm's ACTION: refit on the (grown) corpus and swap the
    * served model crash-safely. Writes a complete new model under
    * `path/v<n+1>` and only then moves the `CURRENT` pointer — a crash
    * anywhere before the publish leaves every reader on the old model;
    * the retry overwrites the same staging directory (idempotent).
    * Single-writer, quiescent-loop contract — same as compaction. */
  def retrainModel(docs: DataFrame, path: String,
                   sampleN: Option[Long] = None, nHint: Long = -1L): Long = {
    val (n, dir) = graft.io.Models.nextDir(path)
    fitTo(docs, dir, sampleN, nHint)
    graft.io.Models.publish(path, n)
    n
  }

  private def fitTo(docs: DataFrame, dir: String,
                    sampleN: Option[Long], nHint: Long): Unit = {
    val tranche = sampleN match {
      case None => docs
      case Some(k) =>
        require(k > 0, s"sampleN must be positive: $k")
        val n = if (nHint >= 0L) nHint else docs.count()
        val m = math.max(1L, n / k)
        docs.filter(
          pmod(xxhash64(col("doc_id"), lit("graft-probe-sample")), lit(m)) === 0)
    }
    val m = train(tranche).localCheckpoint()
    val rate = score(tranche, m)
      .agg(round(avg("pred"), 6).as("train_keep_rate"))
    m.crossJoin(rate).coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def openModel(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(graft.io.Models.currentDir(path))

  /** The probe's retrain trigger — the same posture as `Lm.driftStats`:
    * the decision cut is bootstrap-time state, so a shift in the incoming
    * stream's quality distribution shows up as the shard KEEP RATE
    * diverging from the persisted training keep rate. One shard-scale
    * agg to a single row: (n_docs, n_keep, keep_frac, train_keep_rate,
    * drift, retrain). An EMPTY shard (n_docs = 0) is a defined signal:
    * keep_frac = 0 and retrain fires — zero delivered documents is an
    * upstream problem a null row would hide. Requires a model written by
    * `writeModel` (which persists the reference rate). */
  def driftStats(docs: DataFrame, model: DataFrame,
                 tol: Double = 0.15): DataFrame = {
    require(model.columns.contains("train_keep_rate"),
      "Probe.driftStats needs train_keep_rate — write the model via " +
        "Probe.writeModel")
    score(docs, model)
      .agg(count("*").as("n_docs"),
        coalesce(sum("pred"), lit(0L)).cast("long").as("n_keep"))
      .crossJoin(broadcast(model.select("train_keep_rate")))
      // n_docs = 0 must be a DEFINED signal, not a row of nulls: a shard
      // that delivered zero documents is itself drift-worthy (an upstream
      // outage reads as "no alarm" to any null-tolerant monitor). Define
      // keep_frac = 0 and FIRE retrain for the empty shard.
      .withColumn("keep_frac",
        when(col("n_docs") > 0,
          round(col("n_keep") * lit(1e0) / col("n_docs"), 6))
          .otherwise(lit(0.0)))
      .withColumn("drift",
        round(abs(col("keep_frac") - col("train_keep_rate")), 6))
      .withColumn("retrain", col("n_docs") === 0 || col("drift") > lit(tol))
      .select("n_docs", "n_keep", "keep_frac", "train_keep_rate",
        "drift", "retrain")
  }

  /** Score a shard against a trained model: ONE narrow pass — features,
    * a broadcast 1-row model join, the score and the decision. Emits
    * t13's row shape (doc_id, label, score, pred). */
  def score(docs: DataFrame, model: DataFrame): DataFrame = {
    parserParity(docs.sparkSession)
    val P = TrainingQueries.ProbeSql
    docs.filter(col("text").isNotNull)
      .selectExpr("doc_id", s"${P.x1(Sp)} AS x1", s"${P.x2(Sp)} AS x2",
        s"${P.x3(Sp)} AS x3", s"${P.y(Sp)} AS y")
      .crossJoin(broadcast(model))
      .selectExpr("doc_id", "CAST(y AS INT) AS label",
        s"round(${P.score}, 6) AS score",
        s"CASE WHEN round(${P.score}, 6) >= cut THEN 1 ELSE 0 END AS pred")
  }
}
