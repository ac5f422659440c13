package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Mix

/** The served domain-mix stats table: incremental ingestion must reproduce
  * the corpus-scan mix exactly (x36 pins it against d14's DuckDB oracle in
  * the driver gate; these specs pin the maintenance contract — replay,
  * compaction, folded-epoch interlock — that the driver query doesn't
  * exercise). */
class MixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def freshPath(tag: String): String = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_mixspec_${tag}_${System.nanoTime()}")
    f.getAbsolutePath
  }

  private def ratesMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("incremental stats == corpus-scan stats: baseline + epoch reproduces the full mix") {
    val path = freshPath("inc")
    Mix.writeStats(docs.filter(col("doc_id") % 3 =!= 0), path)
    Mix.appendStats(docs.filter(col("doc_id") % 3 === 0), path, epoch = 1L)
    val served = ratesMap(Mix.rates(Mix.openStats(spark, path)))
    val direct = ratesMap(Mix.rates(Mix.domainStats(docs)))
    assert(served == direct && served.nonEmpty)
    // and the assigned copies equal the d14 SQL query end to end
    val viaSql = SparkEntry.queries("d14_domain_mix")(spark, sf)
    val viaOps = Mix.assign(docs, Mix.rates(Mix.openStats(spark, path)))
    assert(viaOps.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaOps).isEmpty)
  }

  test("replayed append rewrites itself: stats identical after a duplicate epoch ingest") {
    val path = freshPath("replay")
    Mix.writeStats(docs.filter(col("doc_id") % 3 =!= 0), path)
    val shard = docs.filter(col("doc_id") % 3 === 0)
    Mix.appendStats(shard, path, epoch = 1L)
    val first = Mix.openStats(spark, path).orderBy("source", "epoch").collect().toSeq
    Mix.appendStats(shard, path, epoch = 1L) // replay: dynamic overwrite of epoch=1
    val second = Mix.openStats(spark, path).orderBy("source", "epoch").collect().toSeq
    assert(first == second)
    assert(Mix.epochInStats(spark, path, 1L))
    assert(!Mix.epochInStats(spark, path, 2L))
  }

  test("compaction folds epochs to one baseline row per source; rates unchanged; folded replays refused") {
    val path = freshPath("compact")
    Mix.writeStats(docs.filter(col("doc_id") % 3 === 1), path)
    Mix.appendStats(docs.filter(col("doc_id") % 3 === 2), path, epoch = 1L)
    Mix.appendStats(docs.filter(col("doc_id") % 3 === 0), path, epoch = 2L)
    val before = ratesMap(Mix.rates(Mix.openStats(spark, path)))
    val baseline = Mix.compactStats(spark, path)
    assert(baseline == 2L)
    val folded = Mix.openStats(spark, path)
    // one row per source, all under the baseline epoch
    assert(folded.groupBy("source").count().filter(col("count") > 1).isEmpty)
    assert(folded.select(col("epoch").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    assert(ratesMap(Mix.rates(folded)) == before)
    // a folded epoch is still "in", and re-ingesting it fails loudly
    assert(Mix.epochInStats(spark, path, 1L))
    val e = intercept[IllegalArgumentException] {
      Mix.appendStats(docs.limit(5), path, epoch = 2L)
    }
    assert(e.getMessage.contains("folded"))
  }
}
