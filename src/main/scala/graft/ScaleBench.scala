package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the training-data tier: the dedup -> CC ->
  * decontaminate stages on the sf corpus at 1x and Kx (default 10x), so
  * the "CC round overhead amortizes" and "cap join stays flat" claims are
  * measurements, not plan-shape arguments.
  *
  * Replicas are DISTINCT documents, not clones: replica r Caesar-shifts
  * the alphabet by r, so every word (hence every shingle/gram) differs
  * across replicas while doc length, structure, and the intra-replica
  * duplicate rate are preserved — a Kx corpus with the same dup density,
  * which is what "10x more data" means. (Cloning instead would make every
  * doc a 10-way near-dup cluster and measure the pathological-skew path,
  * not scale-up.) Deterministic; no RNG, no wall clock.
  *
  * Prints one JSON line per scale with min-of-3 walls per stage
  * (first pass doubles as warmup, same estimator as Bench).
  */
object ScaleBench {

  private[graft] val abc = "abcdefghijklmnopqrstuvwxyz"

  /** Per-replica alphabet permutation: AFFINE map i -> a*i + b (mod 26),
    * a coprime to 26 — 312 distinct permutations, so replicas stay
    * DISTINCT documents well past the 26 a Caesar shift allows (at 100x
    * a shift-based replica r would equal replica r+26 verbatim — the
    * 4-way-clone pathology, not scale-up). Two distinct affine maps
    * agree on at most TWO letters (both slopes odd, so the difference
    * map has gcd 2 with 26), so no word of >= 3 distinct letters —
    * hence no real-text shingle/gram — collides across replicas (pinned
    * by ScaleBenchSpec; empirically, contamination/span counts scale
    * exactly with the replica count through 100x). */
  private[graft] def affinePerm(r: Int): String = {
    val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val a = coprimes(r % coprimes.length)
    val b = (r / coprimes.length) % 26
    (0 until 26).map(i => ('a' + (a * i + b) % 26).toChar).mkString
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    def docsAt(k: Int): DataFrame = {
      require(k <= 312, s"k=$k exceeds the 312 distinct affine replicas")
      val base = base1
      (0 until k).map { r =>
        val sh = affinePerm(r)
        base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
          translate(col("text"), abc + abc.toUpperCase,
            sh + sh.toUpperCase).as("text"), col("lang"))
      }.reduce(_ unionByName _)
    }

    def bestOf3(f: => Long): (Double, Long) =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)

    spark.range(1000).selectExpr("sum(id)").collect() // codegen warmup

    // SPARK_GRAFT_STAGES=growers: run ONLY the two payload-dominated
    // stages (13-gram decontaminate + ExactSubstr span removal) — the
    // 100x tier that pins their growth ~linear in total text without
    // paying for the already-flat stages at that scale
    val stages = sys.env.getOrElse("SPARK_GRAFT_STAGES", "all")
    if (stages == "growers") {
      scales.foreach { k =>
        val docs = docsAt(k)
        val nDocs = docs.count()
        val (tDecon, nCont) = bestOf3 {
          ops.Decontaminate.contaminated(
            docs.filter("doc_id % 10 <> 7"), "doc_id", "text",
            docs.filter("doc_id % 10 = 7"), "text", n = 13).count()
        }
        val (tSub, nSub) = bestOf3 {
          ops.Decontaminate.removeDupSpans(docs, "doc_id", "text")
            .filter("n_removed > 0").count()
        }
        println(s"""{"scale":$k,"n_docs":$nDocs,"decontaminate_sec":${f"$tDecon%.3f"},"n_contaminated":$nCont,"substr_dedup_sec":${f"$tSub%.3f"},"n_sub_docs":$nSub,"stages":"growers","sf":"$sfDir","cpus":$cpus}""")
      }
      spark.stop()
      return
    }

    scales.foreach { k =>
      val docs = docsAt(k)
      val nDocs = docs.count()
      val (tPairs, nPairs) = bestOf3 {
        ops.Dedup.minhashCandidates(docs, "doc_id", "text").count()
      }
      val (tCc, nKeep) = bestOf3 {
        ops.Dedup.resolveNearDups(docs, "doc_id", "text", threshold = 0.5)
          .filter("is_keeper = 1").count()
      }
      val (tDecon, nCont) = bestOf3 {
        ops.Decontaminate.contaminated(
          docs.filter("doc_id % 10 <> 7"), "doc_id", "text",
          docs.filter("doc_id % 10 = 7"), "text", n = 13).count()
      }
      // round-5 late tier: span removal (gram build + rewrite, 2 corpus
      // passes by construction) and LM train+score end-to-end
      val (tSub, nSub) = bestOf3 {
        ops.Decontaminate.removeDupSpans(docs, "doc_id", "text")
          .filter("n_removed > 0").count()
      }
      val (tLm, _) = bestOf3 {
        ops.Lm.score(docs, ops.Lm.train(docs)).count()
      }
      // per-shard curation cost vs corpus scale: the index probe and the
      // jaccard verify are the only corpus-coupled parts of
      // Curation.curateShard — the SAME fixed ~1k-doc shard is probed
      // against the 1x and Kx indexes. The probe should stay near-flat
      // (bucketed index equi-join, counts stream through a shard-key
      // semi-join); the verify carries the id-selective corpus text fetch,
      // whose narrow projected scan is the honest linear component.
      val sh13 = abc.drop(13) + abc.take(13)
      val shardFresh = base1.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + lit(900000000L)).as("doc_id"),
          translate(col("text"), abc + abc.toUpperCase,
            sh13 + sh13.toUpperCase).as("text"))
      val shardClones = base1.filter(col("doc_id") % 101 === 0)
        .select((col("doc_id") + lit(910000000L)).as("doc_id"), col("text"))
      val shard = shardFresh.unionByName(shardClones)
      val nShard = shard.count()
      val table = s"mh_scalebench_$k"
      Seq(table, s"${table}_counts", s"${table}_params")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      ops.Dedup.writeMinhashIndex(docs, "doc_id", "text", table) // untimed build
      val idx = ops.Dedup.openMinhashIndex(spark, table)
      val (tProbe, nCands) = bestOf3 {
        ops.Dedup.incrementalCandidates(shard, "doc_id", "text", idx).count()
      }
      val (tVerify, nVerified) = bestOf3 {
        val cands = ops.Dedup.incrementalCandidates(shard, "doc_id", "text", idx)
        val texts = shard.select("doc_id", "text")
          .unionByName(docs.select("doc_id", "text"))
        ops.Dedup.jaccardOnCandidates(texts, cands, "doc_id", "text", 0.5)
          .count()
      }
      Seq(table, s"${table}_counts", s"${table}_params")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      // the loop's pre-decision scrub at corpus scale: the same fixed
      // shard scrubbed against the 1x and Kx served gram index — the
      // probe streams the bucketed index (no exchange), so growth here
      // is the index scan itself, not shuffle
      val gtable = s"gx_scalebench_$k"
      Seq(gtable, s"${gtable}_params", s"${gtable}_epochs")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      ops.Decontaminate.writeGramIndex(docs, "text", gtable) // untimed build
      val gidx = ops.Decontaminate.openGramIndex(spark, gtable)
      val (tScrub, nScrub) = bestOf3 {
        ops.Decontaminate.removeDupSpansServed(shard, "doc_id", "text", gidx)
          .filter("n_removed > 0").count()
      }
      Seq(gtable, s"${gtable}_params", s"${gtable}_epochs")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      println(s"""{"scale":$k,"n_docs":$nDocs,"minhash_pairs_sec":${f"$tPairs%.3f"},"n_pairs":$nPairs,"neardup_cc_sec":${f"$tCc%.3f"},"n_keepers":$nKeep,"decontaminate_sec":${f"$tDecon%.3f"},"n_contaminated":$nCont,"substr_dedup_sec":${f"$tSub%.3f"},"n_sub_docs":$nSub,"lm_train_score_sec":${f"$tLm%.3f"},"shard_probe_sec":${f"$tProbe%.3f"},"shard_verify_sec":${f"$tVerify%.3f"},"shard_scrub_sec":${f"$tScrub%.3f"},"n_scrubbed":$nScrub,"n_shard":$nShard,"n_cands":$nCands,"n_verified":$nVerified,"sf":"$sfDir","cpus":$cpus}""")
    }
    spark.stop()
  }
}
