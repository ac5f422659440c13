package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Curation

/** The end-to-end incremental curation loop: every decision branch fires
  * on planted shard docs, and an ACCEPTED shard grows the serving state —
  * a later shard's duplicate of a shard-1 keeper is caught by the index
  * that keeper was folded into. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ixs(tag: String) = Curation.Indexes(
    minhashTable = s"mh_curation_$tag",
    statsPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_curation_stats_${tag}_${System.nanoTime()}").getAbsolutePath,
    modelPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_curation_model_${tag}_${System.nanoTime()}").getAbsolutePath,
    lmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_curation_lm_${tag}_${System.nanoTime()}").getAbsolutePath)

  private def dropTables(table: String): Unit =
    Seq(table, s"${table}_counts", s"${table}_params")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("requireScrub: a scrub-less state is refused loudly at bootstrap") {
    val ix = ixs("reqscrub") // gramTable = None
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"), col("lang")).limit(10)
    val e = intercept[IllegalArgumentException] {
      Curation.bootstrap(docs, ix, requireScrub = true)
    }
    assert(e.getMessage.contains("gram table"), e.getMessage)
  }

  test("all six decisions fire; accepted keepers are caught by the next shard's probe") {
    val ix = ixs("e2e")
    dropTables(ix.minhashTable)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"), col("lang"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    Curation.bootstrap(corpus, ix)

    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliett kilo lima mike november oscar papa"
    val bench = Seq(benchText).toDF("snippet")
    val corpusDocText = corpus.orderBy("doc_id")
      .select("text").as[String].head()
    val longKeep = ("steady quality words with punctuation, present often. " * 8) +
      "This keeps length over the gate floor and token count high enough."
    val keepSix = "Completely separate vocabulary appears within this " +
      "lengthy paragraph. Rivers meander through quiet valleys while amber " +
      "sunsets describe patient horizons. Gentle travelers navigate winding " +
      "pathways beneath ancient cedar branches, collecting memorable stories " +
      "during tranquil evenings beside glowing lanterns."
    val keepFollow = "Another fully independent passage concerning harbors: " +
      "lighthouses signal distant vessels while fishermen repair woven nets " +
      "along weathered docks. Seasonal markets gather merchants, musicians, " +
      "bakers offering warm loaves, plus carpenters displaying oak furniture " +
      "crafted throughout winter months."
    // consonant salad engineered to PASS the heuristic quality gate
    // (>= 10 tokens, > 150 chars, no punctuation) — only the LM's
    // out-of-distribution cut can reject it
    val gibberish = ("xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq " +
      "zqxk jqvz ") * 4
    val planted = Seq(
      (900001L, longKeep + " clone body one two three", "web", "en"),
      (900002L, longKeep + " clone body one two three", "web", "en"), // exact dup of 900001
      (900003L, corpusDocText, "web", "en"),                          // near dup of a corpus doc
      (900004L, benchText + " " + longKeep, "web", "en"),             // contaminated
      (900005L, "tiny junk", "web", "en"),                            // low quality
      (900006L, keepSix, "brand-new-domain", "en"),
      (900007L, gibberish, "web", "en")                               // gibberish (LM gate)
    ).toDF("doc_id", "text", "source", "lang")
    val shard = docs.filter(col("doc_id") % 3 === 0).limit(40)
      .unionByName(planted)

    val decided = Curation.curateShard(spark, shard, corpus, ix,
      bench, "snippet").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    assert(decided(900002L)._1 == "exact_dup" && decided(900002L)._2 == 0)
    assert(decided(900001L)._1 == "keep")
    assert(decided(900003L)._1 == "near_dup")
    assert(decided(900004L)._1 == "contaminated")
    assert(decided(900005L)._1 == "low_quality")
    assert(decided(900006L)._1 == "keep" && decided(900006L)._2 >= 1,
      decided(900006L).toString) // unseen domain defaults to one copy
    assert(decided(900007L)._1 == "gibberish" && decided(900007L)._2 == 0,
      decided(900007L).toString) // heuristic gate passes it; the LM doesn't
    assert(decided.values.count(_._1 == "keep") > 2)

    // accept the keepers; a shard-2 clone of a shard-1 KEEPER must now
    // lose to the grown index (corpus seniority), and the new domain's
    // stats now exist
    val keepIds = decided.collect { case (id, ("keep", _)) => id }.toSet
    val keepers = shard.filter(col("doc_id").isin(keepIds.toSeq: _*))
    Curation.acceptShard(keepers, ix, epoch = 1L)
    // accept grows the caller's corpus table too — the curate contract
    // is that `corpus` has text for every doc the index knows
    val corpus2 = corpus.unionByName(keepers)
    val shard2 = Seq(
      (910001L, keepSix, "brand-new-domain", "en"), // clone of 900006
      (910002L, keepFollow, "web", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val decided2 = Curation.curateShard(spark, shard2, corpus2, ix,
      bench, "snippet").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    assert(decided2(910001L)._1 == "near_dup", decided2.toString)
    assert(decided2(910002L)._1 == "keep")
    dropTables(ix.minhashTable)
  }
}
