package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-file ingestion (SURVEY §2.1 SRC1/SRC7): the reference walks
  * `.pdfContracts/` and feeds each file to its converter
  * (openai_contract_explorer.py:647-658, pdf_converter.py:178-285). The
  * Spark-native entry for that shape is the `binaryFile` source — the
  * driver lists the directory tree (or an object-store prefix at 10^12
  * files: a catalog/manifest listing), executors read the bytes, and each
  * file becomes one (doc_id, filename, length, content) row feeding the
  * decode stage (`ops.Media.Codec` for images; the layout pass for page
  * geometry). Listing-side filters (`pathGlobFilter`, length predicates)
  * prune before any byte is read. */
object Sources {

  /** A directory/glob of raw document files as binary rows.
    * doc_id = filename stem (the reference keys its pipeline on filenames;
    * P13/P20 sanitize/canonicalize them downstream). */
  def binaryDocs(spark: SparkSession, path: String,
                 glob: String = "*.pdf"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(element_at(split(col("path"), "/"), -1).as("filename"),
        col("length"), col("content"))
      .withColumn("doc_id", regexp_replace(col("filename"), "\\.[^.]+$", ""))
      .select("doc_id", "filename", "length", "content")
}
