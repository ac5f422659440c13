package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column. Brute-force cosine is the correctness baseline; the LSH
  * (random-hyperplane) variant is the scale path: bucketing costs one
  * narrow projection + an equi-join on bucket keys, so the 10^12-row
  * corpus never sees an all-pairs product. Hyperplanes are deterministic
  * (splitmix from a fixed seed) — same buckets on every run/cluster. */
object Ann {

  /** Cosine similarity column between two array<float> columns (double math). */
  private def cosExpr(a: String, b: String): String =
    s"""(aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (p, q) -> p + q)
       | / (sqrt(aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (p, q) -> p + q))
       |  * sqrt(aggregate(transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (p, q) -> p + q))))"""
      .stripMargin.replace("\n", " ")

  /** Brute-force top-k for one query vector (broadcast the 1-row query). */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = Seq(Tuple1(query.toSeq)).toDF("qe")
    embeddings.crossJoin(broadcast(q))
      .withColumn("cos_sim", expr(cosExpr(vecCol, "qe")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes: nBits x dim doubles in [-1, 1). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { i =>
        val h = graft.gen.Corpus.mix(seed + b * 1000003L + i)
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  /** Add an LSH bucket column: sign-bit signature against the hyperplanes.
    * One narrow per-row pass (UDF closes over the broadcast-small plane
    * matrix — no join, no shuffle). */
  def withBucket(embeddings: DataFrame, vecCol: String, planes: Array[Array[Double]]): DataFrame = {
    val bucketOf = udf { (v: Seq[Float]) =>
      var b = 0L
      var i = 0
      while (i < planes.length) {
        val p = planes(i)
        var dot = 0.0
        var j = 0
        val n = math.min(p.length, v.length)
        while (j < n) { dot += p(j) * v(j); j += 1 }
        if (dot >= 0) b |= (1L << i)
        i += 1
      }
      b
    }
    embeddings.withColumn("bucket", bucketOf(col(vecCol)))
  }

  /** Embedding-cosine near-dup pairs, the SCALE path: candidates come from
    * a hyperplane-LSH bucket equi-join (shuffle carries only (bucket, id,
    * vector)), the exact cosine is the residual filter. A viral bucket is
    * capped like the minhash/simhash paths — at 10^12 rows one degenerate
    * bucket must not produce O(bucket^2) pairs. Recall vs the brute-force
    * baseline (d06) is probabilistic by design: same-bucket probability is
    * (1 - theta/pi)^nBits; identical/near-identical vectors always
    * collide (tested on planted clones). */
  def neardupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, dim: Int, nBits: Int = 8,
                   maxBucket: Int = 10000): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val bucketed = withBucket(
      embeddings.select(col(idCol).as("id"), col(vecCol).as("v")), "v", planes)
    val bounded = bucketed
      .withColumn("bucket_n", count("*").over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    bounded.as("a").join(bounded.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos_sim", round(expr(cosExpr("a.v", "b.v")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"), col("cos_sim"))
  }

  /** LSH top-k: restrict the cosine scan to the query's bucket PLUS its
    * hamming-1 multiprobe neighborhood (`probeHamming = 1`, the default).
    * A true near-neighbor sits on the wrong side of one hyperplane with
    * probability ~theta/pi per plane, so single-bucket recall collapses as
    * nBits grows; probing the nBits+1 buckets within hamming distance 1
    * restores recall while still scanning only (nBits+1)/2^nBits of the
    * corpus. Probe set is computed driver-side (nBits+1 longs, broadcast
    * as an isin filter — no join, no shuffle). */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, nBits: Int = 8,
              probeHamming: Int = 1): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = query.length
    val planes = hyperplanes(nBits, dim)
    val qBucket = {
      var b = 0L
      planes.zipWithIndex.foreach { case (p, i) =>
        val dot = p.zip(query).map { case (x, y) => x * y.toDouble }.sum
        if (dot >= 0) b |= (1L << i)
      }
      b
    }
    val probes: Seq[Long] =
      if (probeHamming <= 0) Seq(qBucket)
      else qBucket +: (0 until nBits).map(i => qBucket ^ (1L << i))
    val bucketed = withBucket(embeddings, vecCol, planes)
    val q = Seq(Tuple1(query.toSeq)).toDF("qe")
    bucketed.filter(col("bucket").isin(probes: _*))
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", expr(cosExpr(vecCol, "qe")))
      .select(col(idCol), col("cos_sim"))
      .orderBy(desc("cos_sim"), col(idCol))
      .limit(k)
  }
}
