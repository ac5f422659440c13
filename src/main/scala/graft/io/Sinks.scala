package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline.ExtractedDoc

/** Output sinks mirroring the reference's export surfaces (SURVEY §2.1
  * SNK3-SNK7), as distributed writers:
  *
  *  - CSV export (SNK4, openai_contract_explorer.py:411-455): fixed
  *    columns, list fields joined "; ", nulls -> "" — header on.
  *  - JSONL training export (SNK5, :457-496): one JSON object per line
  *    with text/labels/metadata envelopes.
  *  - Summary report (SNK6, :498-568): count-by groupings sorted desc —
  *    written as a table, not driver-rendered text (the text rendering is
  *    a display concern; the data shape is what scales).
  *  - Results envelope (SNK3, :363-409): nested results + summary counts.
  */
object Sinks {

  /** Flatten extraction output to the SNK4 CSV shape. */
  def contractsFlat(extracted: Dataset[ExtractedDoc]): DataFrame =
    extracted.select("contract.*", "status")
      .select(
        col("doc_id"),
        coalesce(col("title"), lit("")).as("contract_name"),
        col("contract_number"),
        col("contract_type"),
        col("currency"),
        coalesce(col("total_value").cast("string"), lit("")).as("total_value"),
        coalesce(col("effective_date"), lit("")).as("effective_date"),
        coalesce(col("expiration_date"), lit("")).as("expiration_date"),
        col("client_name"), col("vendor_name"),
        array_join(col("emails"), "; ").as("emails"),
        array_join(col("cnpj_cpf"), "; ").as("cnpj_cpf"),
        array_join(col("key_clauses"), "; ").as("key_clauses"),
        col("table_count"), col("n_sections"),
        round(col("confidence"), 4).as("confidence"),
        col("status"))

  def writeCsv(extracted: Dataset[ExtractedDoc], path: String): Unit =
    contractsFlat(extracted).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** SNK5 JSONL: Spark's to_json over an explicit struct keeps field order
    * deterministic (struct field order, not map order). */
  def writeJsonl(extracted: Dataset[ExtractedDoc], path: String): Unit =
    extracted.select(to_json(struct(
        col("contract.doc_id").as("doc_id"),
        struct(
          col("contract.contract_number").as("contract_id"),
          col("contract.contract_type").as("contract_type"),
          col("contract.client_name").as("client"),
          col("contract.vendor_name").as("vendor")).as("labels"),
        struct(col("status"), col("partition_id")).as("metadata")
      )).as("line"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** SNK6 summary tables: count-by contract_type / currency, sorted desc. */
  def summary(extracted: Dataset[ExtractedDoc]): DataFrame =
    extracted.select("contract.*")
      .groupBy("contract_type").count()
      .orderBy(desc("count"), asc("contract_type"))

  /** Bucketed table write: co-locates a table on its join key so repeated
    * downstream joins/aggregations on that key skip the shuffle entirely
    * (both sides bucketed on the same key + count -> SortMergeJoin with NO
    * Exchange; verified in SinksSpec). At 100 TB this is the difference
    * between re-shuffling the contracts table per query and shuffling it
    * once at write time — the standard warehouse layout for hot keys. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** SNK3 results envelope: per-status counts + mean confidence. */
  def envelope(extracted: Dataset[ExtractedDoc]): DataFrame =
    extracted.groupBy("status").agg(
      count("*").as("n"),
      round(avg(col("contract.confidence")), 4).as("mean_confidence"))
      .orderBy("status")
}
