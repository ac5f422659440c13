package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Lm

/** The served bigram LM: a persisted model must reproduce the in-query
  * t14 run on its training corpus (x40 pins that against the DuckDB
  * oracle in the driver gate) AND score shards it never saw with the
  * add-one-smoothing fallbacks — verified against an exact driver-side
  * reference that mirrors the quantized arithmetic bit for bit. */
class LmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def normRef(t: String): String =
    t.toLowerCase.split("[^a-zA-Z0-9]+").filter(_.nonEmpty).mkString(" ")

  private def bigramsRef(s: String): Seq[String] =
    if (s.length < 2) Seq.empty
    else (0 until s.length - 1).map(i => s.substring(i, i + 2))

  /** HALF_UP like Spark's round() (ties away from zero). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact reference scorer: quantized q per bigram from the train
    * tranche's counts, with the same smoothing fallbacks. */
  private def scoreRef(train: Seq[(String, String)], shard: Seq[(Long, String, String)])
      : Map[Long, (Long, Long, Double)] = {
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((lang, t) <- train; bg <- bigramsRef(normRef(t)))
      c2((lang, bg)) = c2.getOrElse((lang, bg), 0L) + 1L
    val c1n = c2.groupBy { case ((lang, bg), _) => (lang, bg.substring(0, 1)) }
      .map { case (k, m) => k -> m.values.sum }
    def q(lang: String, bg: String): Long = {
      val n = c1n.getOrElse((lang, bg.substring(0, 1)), 0L)
      ((c2.getOrElse((lang, bg), 0L) + 1) * 1e9 / (n + 37)).toLong
    }
    shard.map { case (id, lang, t) =>
      val bgs = bigramsRef(normRef(t))
      val sumQ = bgs.map(q(lang, _)).sum
      id -> ((bgs.size.toLong, sumQ,
        round6(sumQ * 1.0 / math.max(bgs.size, 1) / 1e9)))
    }.toMap
  }

  test("persisted model reproduces the in-query t14 run exactly") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_lmspec_rt_${System.nanoTime()}").getAbsolutePath
    Lm.writeModel(docs, path)
    val served = Lm.score(docs, Lm.openModel(spark, path))
    val inQuery = SparkEntry.queries("t14_lm_score")(spark, sf)
    assert(served.exceptAll(inQuery).isEmpty && inQuery.exceptAll(served).isEmpty)
  }

  test("unseen-shard scoring == exact quantized reference (smoothing fallbacks fire)") {
    import spark.implicits._
    val trainSet = docs.filter(col("doc_id") % 3 =!= 0)
    val unseen = docs.filter(col("doc_id") % 3 === 0)
    val trainRows = trainSet.select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // char bigrams saturate fast, so a real tranche may cover every shard
    // bigram — PLANT a doc around a bigram provably absent from training,
    // forcing the unseen-bigram smoothing fallback to fire
    val trainBgs = trainRows.iterator
      .flatMap { case (l, t) => bigramsRef(normRef(t)).map((l, _)) }.toSet
    val absentBg = (for (a <- 'a' to 'z'; b <- 'a' to 'z'; bg = s"$a$b"
                         if !trainBgs(("en", bg))) yield bg).head
    val planted = Seq((-1L, "en", s"$absentBg $absentBg some usual words"))
      .toDF("doc_id", "lang", "text")
    val shard = unseen.select("doc_id", "lang", "text").unionByName(planted)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_lmspec_tr_${System.nanoTime()}").getAbsolutePath
    Lm.writeModel(trainSet, path)
    val got = Lm.score(shard, Lm.openModel(spark, path))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val shardRows = shard.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === scoreRef(trainRows, shardRows))
    assert(got.nonEmpty && got.values.forall(v => v._3 > 0.0 && v._3 < 1.0))
    assert(got.contains(-1L))
  }

  test("count ingestion == single build; replays idempotent; folded epochs refused") {
    import spark.implicits._
    val a = docs.filter(col("doc_id") % 4 =!= 3)
    val b = docs.filter(col("doc_id") % 4 === 3)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_lmspec_inc_${System.nanoTime()}").getAbsolutePath
    // baseline on tranche A, shard B arrives as epoch 1
    Lm.writeModel(a, path)
    Lm.appendCounts(b, path, epoch = 1L)
    val probe = docs.select("doc_id", "lang", "text").limit(60)
    def scores(m: Lm.Model) = Lm.score(probe, m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val incremental = scores(Lm.openModel(spark, path))
    // the single-build twin over A ∪ B must be value-identical — integer
    // count sums are associative across the epoch split
    assert(incremental === scores(Lm.train(a.unionByName(b))))
    // replayed ingest rewrites itself byte-identically
    Lm.appendCounts(b, path, epoch = 1L)
    assert(scores(Lm.openModel(spark, path)) === incremental)
    assert(Lm.epochInCounts(spark, path, 1L))
    // compaction folds the epochs; scores unchanged; folded replays refused
    Lm.compactCounts(spark, path)
    assert(scores(Lm.openModel(spark, path)) === incremental)
    assert(Lm.epochInCounts(spark, path, 1L))
    assertThrows[IllegalArgumentException] {
      Lm.appendCounts(b, path, epoch = 1L)
    }
  }

  test("gibberish scores below typical prose for its language") {
    import spark.implicits._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_lmspec_gb_${System.nanoTime()}").getAbsolutePath
    Lm.writeModel(docs, path)
    val model = Lm.openModel(spark, path)
    // a shard in the corpus's 'en' register vs consonant-salad gibberish
    val enWords = docs.filter(col("lang") === "en").select("text")
      .limit(1).collect()(0).getString(0).split(" ").take(30).mkString(" ")
    val shard = Seq(
      (1L, "en", enWords),
      (2L, "en", "xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz")
    ).toDF("doc_id", "lang", "text")
    val s = Lm.score(shard, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s(1L) > s(2L), s.toString)
  }

  test("driftStats: healthy shard quiet, junk-heavy shard fires retrain, uncut language never fires") {
    import spark.implicits._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_lmspec_drift_${System.nanoTime()}").getAbsolutePath
    Lm.writeModel(docs, path)
    val model = Lm.openModel(spark, path)
    // a healthy shard: real corpus docs stay at or above the training
    // minimum, so below_frac = 0 and retrain stays quiet
    val healthy = docs.select("doc_id", "lang", "text").limit(40)
    val quietDf = Lm.driftStats(healthy, model)
    // the documented column order is pinned (a withColumn-appended schema
    // once let the scaladoc and the actual order drift apart)
    assert(quietDf.columns.toSeq == Seq("lang", "n_docs", "n_below",
      "below_frac", "mean_score", "has_cut", "retrain"))
    val quiet = quietDf.collect()
      .map(r => r.getString(0) -> r).toMap
    quiet.values.foreach { r =>
      assert(r.getAs[Long]("n_below") == 0L && !r.getAs[Boolean]("retrain"),
        r.toString)
    }
    // an upstream encoding regression: half the 'en' shard turns to
    // consonant salad -> below_frac 0.5 > 0.1 -> retrain fires for 'en'
    val junk = "xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz"
    val enDocs = docs.filter(col("lang") === "en")
      .select("doc_id", "lang", "text").limit(10)
    val shard = enDocs.unionByName((1001L to 1010L).map(i =>
        (i, "en", junk)).toDF("doc_id", "lang", "text"))
      .unionByName(Seq((2001L, "xx", junk)).toDF("doc_id", "lang", "text"))
    val drift = Lm.driftStats(shard, model).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = drift("en")
    assert(en.getAs[Long]("n_docs") == 20L &&
      en.getAs[Long]("n_below") == 10L &&
      en.getAs[Double]("below_frac") == 0.5 &&
      en.getAs[Boolean]("retrain"), en.toString)
    // 'xx' was never trained: no cut, ungated, never fires — the signal
    // for a NEW language is has_cut=false, not a retrain alarm
    val xx = drift("xx")
    assert(!xx.getAs[Boolean]("has_cut") &&
      xx.getAs[Long]("n_below") == 0L && !xx.getAs[Boolean]("retrain"),
      xx.toString)
  }
}
