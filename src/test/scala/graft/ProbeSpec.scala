package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Probe

/** The served quality probe: a persisted model must reproduce the
  * in-query t13 run on its training corpus (x37 pins that against the
  * DuckDB oracle in the driver gate) AND score shards it never saw —
  * the deployment shape the driver query can't exercise. */
class ProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("persisted model reproduces the in-query training run exactly") {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probespec_rt_${System.nanoTime()}").getAbsolutePath
    Probe.writeModel(docs, path)
    val served = Probe.score(docs, Probe.openModel(spark, path))
    val inQuery = SparkEntry.queries("t13_quality_probe")(spark, sf)
    assert(served.exceptAll(inQuery).isEmpty && inQuery.exceptAll(served).isEmpty)
    // the model is five numbers — rereading it must be byte-stable
    val m1 = Probe.openModel(spark, path).collect().toSeq
    val m2 = Probe.openModel(spark, path).collect().toSeq
    assert(m1 == m2 && m1.size == 1)
  }

  test("a model trained on one tranche scores UNSEEN shards: one narrow pass, sane outputs") {
    val trainSet = docs.filter(col("doc_id") % 3 =!= 0)
    val unseen = docs.filter(col("doc_id") % 3 === 0)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probespec_tr_${System.nanoTime()}").getAbsolutePath
    Probe.writeModel(trainSet, path)
    val scored = Probe.score(unseen, Probe.openModel(spark, path))
    val n = unseen.filter(col("text").isNotNull).count()
    assert(scored.count() == n && n > 0)
    // scoring never trains: the plan contains no aggregate at all —
    // features + broadcast model join + projection only
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      plan.take(2000))
    // the probe's signal survives transfer: unseen docs the d11 gate
    // accepts score strictly above the ones it rejects, on average
    val means = scored.groupBy("label")
      .agg(org.apache.spark.sql.functions.avg("score").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(means(1) > means(0), means.toString)
  }

  test("sampled bootstrap: seeded hash-sample fit is deterministic and gate-agrees with the full fit") {
    val full = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probespec_sf_${System.nanoTime()}").getAbsolutePath
    val samp = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probespec_ss_${System.nanoTime()}").getAbsolutePath
    Probe.writeModel(docs, full)
    Probe.writeModel(docs, samp, sampleN = Some(200L))
    // deterministic retrain: same (corpus, sampleN) -> byte-equal model
    val samp2 = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probespec_ss2_${System.nanoTime()}").getAbsolutePath
    Probe.writeModel(docs, samp2, sampleN = Some(200L), nHint = 500L)
    assert(Probe.openModel(spark, samp).collect().toSeq ==
      Probe.openModel(spark, samp2).collect().toSeq)
    // the sampled fit is a real sample, not the whole corpus (the filter
    // modulus was > 1), and its decisions agree with the exact fit on the
    // overwhelming majority of the gate corpus
    val pf = Probe.score(docs, Probe.openModel(spark, full))
      .select("doc_id", "pred").withColumnRenamed("pred", "pf")
    val ps = Probe.score(docs, Probe.openModel(spark, samp))
      .select("doc_id", "pred").withColumnRenamed("pred", "ps")
    val j = pf.join(ps, "doc_id")
    val n = j.count()
    val agree = j.filter(col("pf") === col("ps")).count()
    assert(n == docs.filter(col("text").isNotNull).count())
    assert(agree * 1.0 / n >= 0.9, s"sampled/full gate agreement $agree/$n")
  }

  test("driftStats: in-distribution shard quiet, junk flood fires the retrain alarm") {
    import spark.implicits._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probespec_drift_${System.nanoTime()}").getAbsolutePath
    Probe.writeModel(docs, path)
    val model = Probe.openModel(spark, path)
    // the training corpus itself: keep_frac == train_keep_rate, drift 0
    val quiet = Probe.driftStats(docs, model).head()
    assert(quiet.getDouble(4) == 0.0 && !quiet.getBoolean(5), quiet.toString)
    // a junk flood: every doc fails the probe, keep_frac collapses to 0
    // and the divergence from the training rate fires the alarm
    val junk = (1L to 50L).map(i => (i, "tiny junk"))
      .toDF("doc_id", "text")
    val alarm = Probe.driftStats(junk, model).head()
    assert(alarm.getLong(1) == 0L && alarm.getDouble(2) == 0.0 &&
      alarm.getBoolean(5), alarm.toString)
    // a model file without the reference rate is refused loudly
    assertThrows[IllegalArgumentException] {
      Probe.driftStats(docs, model.drop("train_keep_rate"))
    }
    // an EMPTY shard is a defined signal, not a null row: zero delivered
    // docs reads keep_frac = 0 with the alarm FIRING (an upstream outage
    // must not look like "no drift" to a null-tolerant monitor)
    val empty = Probe.driftStats(docs.limit(0), model).head()
    assert(empty.getAs[Long]("n_docs") == 0L &&
      empty.getAs[Double]("keep_frac") == 0.0 &&
      empty.getAs[Boolean]("retrain"), empty.toString)
  }
}
