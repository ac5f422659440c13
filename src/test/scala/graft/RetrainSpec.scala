package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.Models
import graft.ops.{Lm, Probe}
import graft.pipeline.Curation

/** The drift tier closed into a loop: alarm -> retrain -> crash-safe
  * versioned swap -> alarm clears. The alarms themselves are spec-pinned
  * elsewhere (ProbeSpec / LmSpec / x42); this suite pins the ACTION. */
class RetrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(tag: String) =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_retrain_${tag}_${System.nanoTime()}").getAbsolutePath

  // 30 long punctuated keepers + 10 short junk rows: both probe label
  // classes present, so the decision cut is a real margin midpoint
  private def goodCorpus(idBase: Long): org.apache.spark.sql.DataFrame = {
    val good = (0 until 30).map { i =>
      (idBase + i,
        s"Document number $i carries steady, well-formed prose. " +
          "Sentences continue with commas, periods, and enough words " +
          "to clear every heuristic floor the probe was trained on. " +
          s"Unique trailer token alpha$i closes the paragraph.",
        "web", "en")
    }
    val junk = (0 until 10).map(i => (idBase + 100 + i, s"tiny junk $i", "web", "en"))
    (good ++ junk).toDF("doc_id", "text", "source", "lang")
  }

  // consonant salad: passes the token/length heuristics, scores far
  // below any natural-language bigram statistics
  private def junkShard(idBase: Long, n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map { i =>
      (idBase + i, (s"xqzj$i wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq " * 5).trim,
        "web", "en")
    }.toDF("doc_id", "text", "source", "lang")

  test("probe: junk flood fires, retrain republishes, grown-stream shard is quiet") {
    val path = tmp("probe")
    val corpus = goodCorpus(1000L)
    Probe.writeModel(corpus, path)
    assert(Models.current(path) == 0L)
    val v0 = Probe.openModel(spark, path)
    val rate0 = v0.select("train_keep_rate").head().getDouble(0)

    val flood = junkShard(5000L, 60)
    val before = Probe.driftStats(flood, v0).head()
    assert(before.getAs[Boolean]("retrain"), before.toString)

    val grown = corpus.unionByName(flood)
    val v = Probe.retrainModel(grown, path)
    assert(v == 1L && Models.current(path) == 1L)
    val v1 = Probe.openModel(spark, path)
    val rate1 = v1.select("train_keep_rate").head().getDouble(0)
    assert(rate1 != rate0, s"retrain did not move train_keep_rate ($rate0)")

    // the stream now looks like the grown corpus: a shard drawn from it
    // scores keep_frac == train_keep_rate under the refit model -> quiet
    val after = Probe.driftStats(grown, v1).head()
    assert(!after.getAs[Boolean]("retrain"), after.toString)
    assert(after.getAs[Double]("drift") == 0.0, after.toString)
  }

  test("lm: gibberish fires per-language, retrain on the grown corpus clears it") {
    val path = tmp("lm")
    val corpus = goodCorpus(2000L)
    Lm.writeModel(corpus, path)
    val flood = junkShard(6000L, 40)
    val before = Lm.driftStats(flood, Lm.openModel(spark, path)).head()
    assert(before.getAs[Boolean]("retrain"), before.toString)

    // the junk register is now part of the corpus: its own scores define
    // the per-language min, so the refit cut (min/2) sits strictly below
    // every junk score and the same shard stops alarming
    val grown = corpus.unionByName(flood)
    assert(Lm.retrainModel(grown, path) == 1L)
    val after = Lm.driftStats(flood, Lm.openModel(spark, path)).head()
    assert(!after.getAs[Boolean]("retrain"), after.toString)
    assert(after.getAs[Long]("n_below") == 0L, after.toString)
  }

  test("crashed retrain is invisible: pointer holds v0, retry overwrites the stage") {
    val path = tmp("crash")
    val corpus = goodCorpus(3000L)
    Probe.writeModel(corpus, path)
    val served = Probe.openModel(spark, path).collect().toSeq

    // a retrain that died after staging but before the pointer publish:
    // a half-written v1 exists, CURRENT still says 0
    val (n, stage) = Models.nextDir(path)
    assert(n == 1L)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stage, "part-garbage.parquet"), "torn write")
    assert(Models.current(path) == 0L)
    assert(Probe.openModel(spark, path).collect().toSeq == served,
      "a crashed retrain leaked into the served model")

    // the retry claims the SAME version number and overwrites the stage
    val grown = corpus.unionByName(junkShard(7000L, 20))
    assert(Probe.retrainModel(grown, path) == 1L)
    assert(Models.current(path) == 1L)
    assert(Probe.openModel(spark, path).count() == 1L)
  }

  test("prune drops superseded versions and keeps the served model byte-identical") {
    val path = tmp("prune")
    val corpus = goodCorpus(4000L)
    Lm.writeModel(corpus, path)
    Lm.retrainModel(corpus.unionByName(junkShard(8000L, 20)), path)
    val served = Lm.score(goodCorpus(4100L), Lm.openModel(spark, path))
      .orderBy("doc_id").collect().toSeq
    assert(Models.prune(path) == Seq(0L))
    assert(!new java.io.File(s"$path/v0").exists())
    assert(Lm.score(goodCorpus(4100L), Lm.openModel(spark, path))
      .orderBy("doc_id").collect().toSeq == served)
    assert(Models.prune(path).isEmpty)
  }

  test("retrainIfDrifted acts per alarm and reports (model, fired, version)") {
    val ix = Curation.Indexes(minhashTable = "unused_retrain",
      statsPath = tmp("stats_unused"), modelPath = tmp("rid_probe"),
      lmPath = tmp("rid_lm"))
    val corpus = goodCorpus(9000L)
    Probe.writeModel(corpus, ix.modelPath)
    Lm.writeModel(corpus, ix.lmPath)

    // quiet shard: the training mix itself (keep_frac == train_keep_rate
    // exactly; a good-docs-only slice WOULD fire — drift is two-sided)
    val quiet = Curation.retrainIfDrifted(spark, corpus, corpus, ix)
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(quiet == Map("probe" -> (false, 0L), "lm" -> (false, 0L)), quiet.toString)

    // junk flood: both alarms fire, both models republish as v1
    val flood = junkShard(9500L, 60)
    val grown = corpus.unionByName(flood)
    val acted = Curation.retrainIfDrifted(spark, flood, grown, ix)
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(acted == Map("probe" -> (true, 1L), "lm" -> (true, 1L)), acted.toString)

    // the loop converged: the same stream mix no longer fires either alarm
    val settled = Curation.retrainIfDrifted(spark, grown, grown, ix)
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(settled == Map("probe" -> (false, 1L), "lm" -> (false, 1L)), settled.toString)
  }
}
