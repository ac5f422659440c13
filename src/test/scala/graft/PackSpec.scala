package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pack

/** Sequence packing (ops/Pack.scala): hand-checked boundary cases, the
  * distributed prefix sum == the global-window oracle SQL, and invariance
  * to both input partitioning and the bucket count. */
class PackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("hand case: straddling, zero-token, and boundary docs") {
    import spark.implicits._
    val docs = Seq((1L, 5), (2L, 10), (3L, 600), (4L, 0), (5L, 2))
      .toDF("doc_id", "ntok")
    val out = Pack.packOffsets(docs, "doc_id", "ntok", seqLen = 512, partitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, 5L, 0L, 0L, 0L),
      (2L, 10L, 5L, 0L, 0L),
      (3L, 600L, 15L, 0L, 1L),   // straddles the 512 boundary
      (4L, 0L, 615L, 1L, 1L),    // empty doc: first == last
      (5L, 2L, 615L, 1L, 1L)))
  }

  test("distributed prefix sum == global-window oracle SQL on real docs") {
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")
    val sqlRows = SparkEntry.queries("t07_seq_pack")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val typed = SparkEntry.queries("x22_seq_pack")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(typed === sqlRows)
    assert(typed.nonEmpty)
  }

  test("empty input yields an empty typed frame; absurd ids fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int)].toDF("doc_id", "ntok")
    val out = Pack.packOffsets(empty, "doc_id", "ntok", seqLen = 512)
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_tokens", "offset", "first_pack", "last_pack"))
    assert(out.count() === 0)
    // sparse huge ids would overflow id*partitions — clear require, not an
    // ANSI arithmetic error deep in the job
    val sparse = Seq((Long.MaxValue - 5L, 10)).toDF("doc_id", "ntok")
    val e = intercept[IllegalArgumentException] {
      Pack.packOffsets(sparse, "doc_id", "ntok", seqLen = 512, partitions = 64)
    }
    assert(e.getMessage.contains("overflow"))
    // degenerate partitions=1 edge: maxId=Long.MaxValue passes the
    // division guard, but maxId+1 would wrap negative — must still fail
    // with the densify message, not a missing-key error downstream
    val extreme = Seq((Long.MaxValue, 10)).toDF("doc_id", "ntok")
    val e1 = intercept[IllegalArgumentException] {
      Pack.packOffsets(extreme, "doc_id", "ntok", seqLen = 512, partitions = 1)
    }
    assert(e1.getMessage.contains("overflow"))
  }

  test("invariant to input partitioning and bucket count") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, (i % 37).toInt)).toDF("doc_id", "ntok")
    val a = Pack.packOffsets(docs, "doc_id", "ntok", 64, partitions = 4)
      .collect().map(_.toSeq).toSet
    val b = Pack.packOffsets(docs.repartition(13), "doc_id", "ntok", 64, partitions = 64)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
