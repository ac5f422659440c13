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

  test("SNK6 summary + SNK3 envelope shapes") {
    val s = Sinks.summary(extracted).collect()
    assert(s.map(_.getLong(1)).sum == 500)
    // sorted by count desc
    assert(s.map(_.getLong(1)).toSeq == s.map(_.getLong(1)).toSeq.sortBy(-_))
    val e = Sinks.envelope(extracted).collect()
    assert(e.exists(r => r.getString(0) == "ok" && r.getLong(1) == 500))
  }
}
