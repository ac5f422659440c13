package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val extracted = pipeline.Pipeline.extract(
    gen.Corpus.corpus(spark, "/root/testdata/sf0.001")).cache()

  test("SNK4 CSV: header, joined lists, empty-for-null, round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Sinks.writeCsv(extracted, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 500)
    assert(back.columns.contains("emails") && back.columns.contains("confidence"))
    val r = back.filter(back("emails").contains("; ")).count()
    assert(r >= 0) // joined-list column parses
  }

  test("SNK5 JSONL: one valid JSON per line with envelopes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    Sinks.writeJsonl(extracted, dir)
    val lines = spark.read.text(dir)
    assert(lines.count() == 500)
    val parsed = spark.read.json(dir)
    assert(parsed.select("labels.contract_id").count() == 500)
    assert(parsed.columns.toSet == Set("doc_id", "labels", "metadata"))
  }

  test("bucketed write: co-located join plans with NO shuffle exchange") {
    import org.apache.spark.sql.functions._
    val flat = Sinks.contractsFlat(extracted)
    Sinks.writeBucketed(flat.select("doc_id", "contract_type"), "bt_contracts", "doc_id", 8)
    Sinks.writeBucketed(flat.select(col("doc_id"), col("confidence")), "bt_scores", "doc_id", 8)
    val joined = spark.table("bt_contracts").join(spark.table("bt_scores"), "doc_id")
    assert(joined.count() == 500)
    val plan = joined.queryExecution.executedPlan.toString
    // both sides bucketed on the join key with equal bucket counts:
    // the join must not re-shuffle either side
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2500))
    spark.sql("DROP TABLE bt_contracts"); spark.sql("DROP TABLE bt_scores")
  }

  test("ORC sink/source: contracts round-trip, predicate pushdown reaches the scan") {
    // the second columnar format beside parquet (built-in; at 100 TB the
    // choice is a config, and pushdown must survive it)
    val dir = "/tmp/graft-test-orc"
    val flat = Sinks.contractsFlat(extracted)
    flat.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === flat.count())
    val one = flat.select("doc_id").head.getString(0)
    val q = back.filter(back("doc_id") === one).select("contract_number")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains(s"EqualTo(doc_id,$one)"), // pushed, not post-filtered
      plan.linesIterator.filter(_.contains("FileScan")).mkString("\n"))
    assert(q.count() === 1)
  }

  test("binaryFile source: raw docs round-trip, glob filters at listing time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toString
    val payloads = Map("a.pdf" -> Array[Byte](1, 2, 3), "b.pdf" -> Array[Byte](4, 5),
      "skip.txt" -> Array[Byte](9))
    payloads.foreach { case (n, bs) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, n), bs)
    }
    val docs = graft.io.Sources.binaryDocs(spark, dir)
    val rows = docs.collect().map(r => r.getString(0) ->
      (r.getLong(2), r.getAs[Array[Byte]](3).toSeq)).toMap
    assert(rows.keySet === Set("a", "b")) // .txt pruned by the glob
    assert(rows("a") === ((3L, Seq[Byte](1, 2, 3))))
    assert(rows("b") === ((2L, Seq[Byte](4, 5))))
  }

  test("SNK6 summary + SNK3 envelope shapes") {
    val s = Sinks.summary(extracted).collect()
    assert(s.map(_.getLong(1)).sum == 500)
    // sorted by count desc
    assert(s.map(_.getLong(1)).toSeq == s.map(_.getLong(1)).toSeq.sortBy(-_))
    val e = Sinks.envelope(extracted).collect()
    assert(e.exists(r => r.getString(0) == "ok" && r.getLong(1) == 500))
  }
}
