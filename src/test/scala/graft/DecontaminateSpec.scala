package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Decontaminate

/** Benchmark decontamination (ops/Decontaminate.scala): planted
  * contamination, short-text edge, brute-force gram-intersect parity on
  * the real planted corpus, and plan shape. */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def norm(t: String): Seq[String] =
    t.toLowerCase.split("[^a-zA-Z0-9]+").filter(_.nonEmpty).toSeq

  private def grams(t: String, n: Int): Set[String] = {
    val w = norm(t)
    if (w.size < n) Set.empty else w.sliding(n).map(_.mkString(" ")).toSet
  }

  /** HALF_UP like Spark's round() and DuckDB's (ties away from zero) —
    * math.rint is banker's rounding and diverges on exact decimal ties
    * (e.g. 113/128 = 0.8828125). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("planted 13-gram contamination is flagged, clean docs are not") {
    import spark.implicits._
    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa"
    val contaminated = "intro words then " +
      "bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike november" +
      " trailing words"
    val clean = "completely different content with no overlap at all " +
      "one two three four five six seven eight nine ten eleven twelve thirteen"
    val corpus = Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text")
    val bench = Seq(benchText).toDF("btext")
    val out = Decontaminate.contaminated(corpus, "doc_id", "text", bench, "btext")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet === Set(1L))
    assert(out(1L) === 1) // exactly one shared 13-gram
  }

  test("texts shorter than n words produce no grams and no rows") {
    import spark.implicits._
    val corpus = Seq((1L, "too short"), (2L, "")).toDF("doc_id", "text")
    val bench = Seq("also short").toDF("btext")
    assert(Decontaminate.contaminated(corpus, "doc_id", "text", bench, "btext")
      .count() === 0)
  }

  test("operator == brute-force gram intersect on the planted corpus (n=13)") {
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")
    val docs = spark.sql(
      s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val (bench, corpus) = docs.partition(_._1 % 10 == 7)
    val benchGrams = bench.iterator.flatMap(d => grams(d._2, 13)).toSet
    val expected = corpus.flatMap { case (id, t) =>
      val hits = grams(t, 13).count(benchGrams)
      if (hits > 0) Some(id -> hits) else None
    }.toMap

    val corpusDf = spark.sql(
      s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents WHERE doc_id % 10 <> 7")
    val benchDf = spark.sql(
      s"SELECT ${graft.queries.Dialect.Ctext} AS ctext FROM documents WHERE doc_id % 10 = 7")
    val got = Decontaminate.contaminated(corpusDf, "doc_id", "ctext", benchDf, "ctext")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty, "planted corpus should produce contamination hits")
  }

  test("bloom-prefiltered form is row-identical to the exact join, and prunes pre-exchange") {
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")
    val corpusDf = spark.sql(
      s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents WHERE doc_id % 10 <> 7")
    val benchDf = spark.sql(
      s"SELECT ${graft.queries.Dialect.Ctext} AS ctext FROM documents WHERE doc_id % 10 = 7")
    val exact = Decontaminate.contaminated(corpusDf, "doc_id", "ctext", benchDf, "ctext")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // bloom false positives must die in the exact join — at ANY fpp,
    // including an absurdly sloppy filter
    for (fpp <- Seq(0.01, 0.3)) {
      val got = Decontaminate.contaminatedPrefiltered(
          corpusDf, "doc_id", "ctext", benchDf, "ctext", fpp = fpp)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === exact, s"fpp=$fpp")
    }
    // the size hint must not change results (same pattern as hashSample)
    val hinted = Decontaminate.contaminatedPrefiltered(
        corpusDf, "doc_id", "ctext", benchDf, "ctext", expectedBenchGrams = 100000L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hinted === exact)
    // plan: the bloom probe filter sits BELOW the first exchange of the
    // corpus gram derivation (pruning before any shuffle is the point)
    val df = Decontaminate.contaminatedPrefiltered(
      corpusDf, "doc_id", "ctext", benchDf, "ctext")
    df.count()
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toVector
    def depth(l: String): Int = l.indexWhere(_.isLetter)
    val udfFilters = lines.zipWithIndex
      .filter(p => p._1.contains("Filter") && p._1.contains("UDF")).map(_._2)
    assert(udfFilters.nonEmpty, lines.take(40).mkString("\n"))
    // no Exchange may appear BELOW the probe filter in its subtree
    assert(udfFilters.exists { fi =>
      val d0 = depth(lines(fi))
      var i = fi + 1; var clean = true
      while (i < lines.length && depth(lines(i)) > d0) {
        if (lines(i).contains("Exchange")) clean = false
        i += 1
      }
      clean
    }, "bloom probe filter is not pre-exchange:\n" + lines.mkString("\n").take(3000))
  }

  test("overlapScore == brute-force ratios; gram-free and clean docs score 0") {
    import spark.implicits._
    val benchText = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa"
    val contaminated = "intro words then " +
      "bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike november" +
      " trailing words"
    val clean = "completely different content with no overlap at all " +
      "one two three four five six seven eight nine ten eleven twelve thirteen"
    val tiny = "too short for grams"
    val corpus = Seq((1L, contaminated), (2L, clean), (3L, tiny)).toDF("doc_id", "text")
    val bench = Seq(benchText).toDF("btext")
    val out = Decontaminate.overlapScore(corpus, "doc_id", "text", bench, "btext")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    // brute expectations
    val g1 = grams(contaminated, 13); val g2 = grams(clean, 13)
    val bg = grams(benchText, 13)
    assert(out(1L) == ((g1.size, g1.count(bg), round6(g1.count(bg).toDouble / g1.size))))
    assert(out(2L) == ((g2.size, 0, 0.0)))
    assert(out(3L) == ((0, 0, 0.0))) // gram-free doc still present, score 0
    assert(out(1L)._3 > 0.0)
  }

  test("selfDupScore == brute-force cross-document gram duplication on the real corpus") {
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")
    val docs = spark.sql(
      s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val perDoc = docs.map { case (id, t) => id -> grams(t, 13) }
    val gramDocs = perDoc.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet.size)
    val expected = perDoc.map { case (id, gs) =>
      val dup = gs.count(g => gramDocs(g) >= 2)
      id -> ((gs.size, dup, round6(dup.toDouble / math.max(gs.size, 1))))
    }.toMap
    val docsDf = spark.sql(
      s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")
    val got = Decontaminate.selfDupScore(docsDf, "doc_id", "ctext")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got === expected)
    // the synthesized corpus shares boilerplate grams across docs
    assert(got.values.exists(_._2 > 0), "expected cross-document duplicated grams")
    // and not everything is duplicated
    assert(got.values.exists(v => v._2 < v._1))
  }

  /** Driver-side reference for removeDupSpans: mark every word covered by
    * a cross-doc-shared n-gram whose keeper (min id) is another doc, then
    * rebuild from the survivors. */
  private def removeRef(docs: Seq[(Long, String)], n: Int): Map[Long, (Int, Int, String)] = {
    val words = docs.map { case (id, t) => id -> norm(t) }
    val owners = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, w) <- words; if w.size >= n; g <- w.sliding(n))
      owners.getOrElseUpdate(g.mkString(" "), scala.collection.mutable.Set.empty) += id
    val keeper = owners.collect { case (g, ids) if ids.size >= 2 => g -> ids.min }
    words.map { case (id, w) =>
      val covered = Array.fill(w.size)(false)
      for (i <- 0 to w.size - n; if w.size >= n) {
        val g = w.slice(i, i + n).mkString(" ")
        keeper.get(g) match {
          case Some(k) if k != id => (i until i + n).foreach(covered(_) = true)
          case _ =>
        }
      }
      val kept = w.zipWithIndex.collect { case (word, i) if !covered(i) => word }
      id -> ((w.size, w.size - kept.size, kept.mkString(" ")))
    }.toMap
  }

  test("removeDupSpans: keeper keeps the run, the copy loses exactly it, a clone empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb x y z w v cc dd ee ff gg hh"), // min id owning the shared run
      (2L, "pp qq x y z w v rr ss tt uu"),       // loses the 5-word run only
      (3L, "one two three four five six"),        // unique — untouched
      (4L, "dup1 dup2 dup3 dup4 dup5"),           // keeper of the clone pair
      (5L, "dup1 dup2 dup3 dup4 dup5"),           // full clone — empties
      (6L, "hi"))                                 // shorter than n — untouched
    val out = Decontaminate.removeDupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((13, 0, "aa bb x y z w v cc dd ee ff gg hh")))
    assert(out(2L) == ((11, 5, "pp qq rr ss tt uu")))
    assert(out(3L) == ((6, 0, "one two three four five six")))
    assert(out(4L) == ((5, 0, "dup1 dup2 dup3 dup4 dup5")))
    assert(out(5L) == ((5, 5, "")))
    assert(out(6L) == ((1, 0, "hi")))
    assert(out === removeRef(docs, 3))
  }

  test("removeDupSpans == brute-force reference on the real corpus (n=13)") {
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")
    val docsDf = spark.sql(
      s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")
    val docs = docsDf.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expected = removeRef(docs, 13)
    val got = Decontaminate.removeDupSpans(docsDf, "doc_id", "ctext")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got === expected)
    // the planted boilerplate must actually trigger removals...
    assert(got.values.exists(_._2 > 0), "expected duplicated spans removed")
    // ...while unique prose survives (nothing removed from SOME docs)
    assert(got.values.exists(v => v._2 == 0 && v._1 > 0))
    // and the result is repartition-invariant
    val got17 = Decontaminate.removeDupSpans(docsDf.repartition(17), "doc_id", "ctext")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got17 === got)
  }

  test("removeDupSpans plan: equi-joins only, no cartesian") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val p = Decontaminate.removeDupSpans(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("plan: gram-hash equi-join, no cartesian") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f g h i j k l m n o")).toDF("doc_id", "text")
    val bench = Seq("a b c d e f g h i j k l m").toDF("btext")
    val p = Decontaminate.contaminated(corpus, "doc_id", "text", bench, "btext")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }
}
