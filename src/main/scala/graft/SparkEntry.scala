package graft

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{ExtractQueries, LayoutQueries, RelationalQueries, SinkQueries, TrainingQueries, ValidationQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries come in two tiers:
  *  - dialect-shared SQL operators (ExtractQueries / RelationalQueries /
  *    TrainingQueries): each has a DuckDB oracle in `oracleSql`, rendered
  *    from the same body, so the driver's hash-compare checks them exactly;
  *  - pipeline queries (x* prefix): full span-pipeline operators whose
  *    semantics aren't SQL-expressible (ordered-span folds, salted merge,
  *    LSH buckets) — driver records rows-only checks; their correctness
  *    gate is the golden/property suite under `sbt -batch test`.
  */
object SparkEntry {

  private val TableNames = Seq("documents", "lineitem", "orders", "customer",
    "supplier", "part", "nation", "region", "events", "embeddings")

  private val shared: Map[String, (String, String)] =
    ExtractQueries.all ++ RelationalQueries.all ++ TrainingQueries.all ++
      SinkQueries.all ++ ValidationQueries.all ++ LayoutQueries.all

  /** Register the parquet tables a query mentions and run its Spark SQL.
    * escapedStringLiterals makes Spark read regex literals verbatim, the
    * same way DuckDB does — required for pattern parity with the oracle. */
  private def runShared(sqlText: String)(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    graft.functions.GraftFunctions.register(spark)
    TableNames.filter(sqlText.contains).foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    spark.sql(sqlText)
  }

  /** Flagship: full extraction pipeline on the synthesized corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = gen.Corpus.corpus(spark, "/root/testdata/sf0.001")
    pipeline.Pipeline.extract(docs).select("contract.*", "status")
  }

  /** Driver-comparator-safe projection of contract rows: every array
    * column is flattened to a deterministic '; '-joined string (the
    * driver's pandas sort crashes on array cells — VERDICT r1 #1),
    * mirroring io.Sinks.contractsFlat / the reference's SNK4 CSV shape. */
  private def flatContracts(df: DataFrame): DataFrame =
    df.withColumn("emails", array_join(col("emails"), "; "))
      .withColumn("cnpj_cpf", array_join(col("cnpj_cpf"), "; "))
      .withColumn("key_clauses", array_join(col("key_clauses"), "; "))
      .withColumn("confidence", round(col("confidence"), 4))

  /** The ANN query vector (vec_id = 0), with a meaningful failure when the
    * embeddings table lacks it — not an opaque index-out-of-bounds. */
  private def queryVector(emb: DataFrame, dir: String): Array[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").collect().headOption
      .map(_.getSeq[Float](0).toArray)
      .getOrElse(sys.error(s"query vector vec_id=0 missing from $dir/embeddings.parquet"))

  /** Pipeline-tier queries (rows-only driver check; gated by sbt test). */
  private val pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_extract_contracts" -> ((s: SparkSession, dir: String) => {
      flatContracts(pipeline.Pipeline.extract(gen.Corpus.corpus(s, dir))
        .select("contract.*", "status")).orderBy("doc_id")
    }),
    "x02_extract_salted" -> ((s: SparkSession, dir: String) => {
      flatContracts(pipeline.Pipeline.extractSalted(gen.Corpus.corpus(s, dir), chunkSize = 128)
        .select("contract.*")).orderBy("doc_id")
    }),
    "x03_lineage" -> ((s: SparkSession, dir: String) => {
      val ext = pipeline.Pipeline.extract(gen.Corpus.corpus(s, dir))
      pipeline.Pipeline.lineage(ext, "snap-q").toDF().orderBy("doc_id")
    }),
    "x04_chunks" -> ((s: SparkSession, dir: String) => {
      // P15 chunk explode over raw document text
      val chunk = udf((t: String) => graft.extract.Rules.chunkText(Option(t).getOrElse(""), 128))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), explode(chunk(col("text"))).as("c"))
        .select(col("doc_id"), col("c._1").as("start"), col("c._2").as("chunk"))
        .orderBy("doc_id", "start")
    }),
    // D7 — near-dup cluster resolution: the d02 jaccard pairs (value-exact
    // vs the oracle) as edges, closed into components by the REAL
    // large-star/small-star operator, keeper = min id per component.
    // Oracle: DuckDB recursive CTE over the same pairs (D07OracleDuck).
    "d07_dedup_components" -> ((s: SparkSession, dir: String) => {
      val edges = runShared(shared("d02_jaccard_pairs")._1)(s, dir)
        .select("doc_a", "doc_b")
      val cc = ops.Dedup.connectedComponents(edges, "doc_a", "doc_b")
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"))
      docs.join(cc, docs("doc_id") === cc("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .withColumn("is_keeper",
          when(col("doc_id") === col("component"), 1).otherwise(0))
        .orderBy("doc_id")
    }),
    // D8 — embedding-space twin of d07: the d06 brute-force cosine pairs
    // (value-exact vs the oracle) as edges, closed by the real CC operator,
    // keeper = min vec_id. Oracle: DuckDB recursive CTE (D08OracleDuck).
    // The LSH scale path for the same decision is x16_embed_components.
    "d08_embed_components" -> ((s: SparkSession, dir: String) => {
      val edges = runShared(shared("d06_embed_neardup")._1)(s, dir)
        .select("vec_a", "vec_b")
      val cc = ops.Dedup.connectedComponents(edges, "vec_a", "vec_b")
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("vec_id"))
      emb.join(cc, emb("vec_id") === cc("id"), "left")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("component"))
        .withColumn("is_keeper",
          when(col("vec_id") === col("component"), 1).otherwise(0))
        .orderBy("vec_id")
    }),
    "x16_embed_components" -> ((s: SparkSession, dir: String) => {
      // scale path for d08: OR-amplified LSH candidates -> cosine verify ->
      // components -> keepers, end to end. Threshold 0.9 (SemDeDup-style
      // true near-dups), NOT d08's 0.4: at cos 0.9 a pair survives a table
      // with p = (1-theta/pi)^8 ~= 0.29, so 4 tables recall ~0.76 of edges
      // and ~1.0 of clone edges (OpsSpec pins cluster recall). At cos 0.4
      // the per-bit gap vs random pairs (0.63 vs 0.5) is too small for ANY
      // (nBits, L) to be selective and high-recall at once — mid-similarity
      // mining is the brute path's job (d08, the value-exact baseline).
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      // drop accumulator threaded like x05/x13: a bucket-capped corpus at
      // this call site must not read as "every doc is its own component"
      // with no coverage-loss signal (VERDICT r4 #1 — the last silent cap)
      val acc = s.sparkContext.longAccumulator("x16_dropped_rows")
      ops.Ann.resolveNearDups(emb, "vec_id", "embedding", 0.9, dim = 64,
          nBits = 8, nTables = 4, droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value))
        .orderBy("vec_id")
    }),
    "x05_minhash_pairs" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      // drop accumulator threaded AND surfaced as a constant column: the
      // driver-visible rows themselves carry the coverage-loss signal, so
      // a bucket-capped corpus can't silently read as "no dups" (the
      // count is final before this function returns — capByKey adds to
      // the accumulator eagerly at plan-build time)
      val acc = s.sparkContext.longAccumulator("x05_dropped_rows")
      ops.Dedup.minhashCandidates(docs, "doc_id", "text", droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value)).orderBy("doc_a", "doc_b")
    }),
    // Incremental ingestion dedup: the corpus split at a boundary — 80%
    // pre-indexed (written minhash bucket index, bucketed+sorted layout),
    // 20% arriving as the new shard. Candidates come from the shard-vs-
    // index probe (corpus side streams with NO exchange) plus the
    // within-shard self-join; the bucket cap applies to COMBINED
    // corpus+shard bucket sizes via the index's pre-aggregated counts.
    // Spec-pinned equal to the full-corpus x05 pairs touching shard docs.
    "x32_incremental_dedup" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val shard = docs.filter(col("doc_id") % 5 === 0)
      val table = s"graft_x32_mh_idx_${Integer.toHexString(dir.hashCode)}"
      ops.Dedup.writeMinhashIndex(corpus, "doc_id", "text", table)
      val idx = ops.Dedup.openMinhashIndex(s, table)
      val acc = s.sparkContext.longAccumulator("x32_dropped_rows")
      ops.Dedup.incrementalCandidates(shard, "doc_id", "text", idx,
          droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value))
        .orderBy("doc_a", "doc_b")
    }),
    "x06_simhash_pairs" -> ((s: SparkSession, dir: String) => {
      // maxDist=3 -> 4 pigeonhole blocks of 16 bits = 65536 keys/block, so
      // the block equi-join stays selective at 10^12 docs (maxDist=12 gave
      // 4-bit blocks = 16 keys -> near-cartesian; VERDICT r1 #2).
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val acc = s.sparkContext.longAccumulator("x06_dropped_rows")
      ops.Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3, droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value)).orderBy("doc_a", "doc_b")
    }),
    "x07_ann_lsh" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      // nBits sizes to the corpus: 4 bits = 16 buckets over ~10^2..10^3
      // vectors (multiprobe scans 5/16); at 10^9+ rows use the operator
      // default 8+ so buckets stay selective — same sizing rule the
      // near-dup paths apply (and the rule the r2 x13 call site broke)
      ops.Ann.lshTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10, nBits = 4)
    }),
    "x08_media_features" -> ((s: SparkSession, dir: String) => {
      // REAL decode path: genuine PNG payloads via the JDK's ImageIO
      val media = ops.Media.mediaTable(gen.Corpus.corpus(s, dir), ops.Media.ImageIoCodec)
      // features array -> rounded '; '-joined string (driver-comparator-safe)
      ops.Media.withFeatures(media, codec = ops.Media.ImageIoCodec)
        .withColumn("features",
          array_join(transform(col("features"), f => round(f, 4).cast("string")), "; "))
        .orderBy("doc_id", "media_ref")
    }),
    "x13_embed_neardup_lsh" -> ((s: SparkSession, dir: String) => {
      // scale path for d06: OR-amplified LSH (4 independent 8-bit
      // hyperplane tables, union of bucket equi-joins) + residual cosine
      // filter. Corpus-appropriate nBits keeps buckets selective at any
      // scale; the extra tables restore recall on true near-neighbors
      // (recall property vs brute force in OpsSpec) — the r2 call site's
      // nBits=1 half-space buckets silently exceeded maxBucket at scale.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val acc = s.sparkContext.longAccumulator("x13_dropped_rows")
      ops.Ann.neardupPairs(emb, "vec_id", "embedding", 0.4, dim = 64,
          nBits = 8, nTables = 4, droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value)).orderBy("vec_a", "vec_b")
    }),
    "x14_ann_ivf" -> ((s: SparkSession, dir: String) => {
      // IVF scale path: centroids from a bounded sample, probe 2/8 cells
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      ops.Ann.Ivf.topK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, 10, nlist = 8, nProbe = 2, sampleN = 400)
    }),
    "x19_ann_pq" -> ((s: SparkSession, dir: String) => {
      // product-quantization scale path: m-byte codes are the resident
      // index, ADC shortlist (TakeOrderedAndProject), exact re-rank on
      // k*refine rows only (OpsSpec pins recall >= 0.9 vs brute force).
      // ksub=16 fits this 64-dim/5k-row corpus (sample >= ksub per
      // subspace); production deployments use ksub=256 (byte codes) with
      // the same operator parameters.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val cb = ops.Ann.Pq.train(corpus, "vec_id", "embedding", dim = 64,
        m = 8, ksub = 16, sampleN = 400)
      ops.Ann.Pq.topK(corpus, "vec_id", "embedding", q, 10, cb, refine = 10)
    }),
    "x20_ann_ivfpq" -> ((s: SparkSession, dir: String) => {
      // faiss IVFPQ composition: nProbe cell scan x m-byte ADC codes,
      // exact re-rank on the shortlist only
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val cb = ops.Ann.Pq.train(corpus, "vec_id", "embedding", dim = 64,
        m = 8, ksub = 16, sampleN = 400)
      val ivf = ops.Ann.Ivf.buildIndex(corpus, "vec_id", "embedding",
        nlist = 8, sampleN = 400)
      ops.Ann.Pq.topKIvf(ivf, cb, q, 10, nProbe = 4, refine = 10)
    }),
    // The served PQ shape: codes WRITTEN once (the m-byte resident index;
    // vectors are not in the index), REOPENED, ADC over the codes table
    // with no encode pass, shortlist ids joined back to the source for
    // the exact re-rank — value-equal to x19 (spec-pinned).
    "x28_ann_pq_served" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val cb = ops.Ann.Pq.train(corpus, "vec_id", "embedding", dim = 64,
        m = 8, ksub = 16, sampleN = 400)
      val idxPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x28_pq_index_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Ann.Pq.writeIndex(ops.Ann.Pq.encode(corpus, "embedding", cb), "vec_id",
        cb, idxPath)
      val (codes, cbOpened) = ops.Ann.Pq.openIndex(s, idxPath)
      ops.Ann.Pq.topKServed(codes, "vec_id", cbOpened,
        corpus, "vec_id", "embedding", q, 10, refine = 10)
    }),
    // The full billion-scale serving composition: codes partitioned by
    // IVF cell on disk, probes prune directories AND read m-byte codes
    // only; value-equal to the in-memory x20 (spec-pinned, including a
    // PartitionFilters assertion on the pruned scan).
    "x30_ann_ivfpq_served" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val cb = ops.Ann.Pq.train(corpus, "vec_id", "embedding", dim = 64,
        m = 8, ksub = 16, sampleN = 400)
      val ivf = ops.Ann.Ivf.buildIndex(corpus, "vec_id", "embedding",
        nlist = 8, sampleN = 400)
      val idxPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x30_ivfpq_index_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Ann.Pq.writeIvfPqIndex(ivf, cb, idxPath)
      val served = ops.Ann.Pq.openIvfPqIndex(s, idxPath, "vec_id")
      ops.Ann.Pq.topKIvfServed(served, corpus, "vec_id", "embedding",
        q, 10, nProbe = 4, refine = 10)
    }),
    // D12 scale path — LSH-bucketed k-NN similarity join (OR-amplified
    // bucket equi-join + per-query window top-k; planted recall in
    // OpsSpec; d12 is the value-exact brute twin)
    "x21_knn_join_lsh" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val acc = s.sparkContext.longAccumulator("x21_dropped_rows")
      ops.Ann.knnJoin(emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 3, dim = 64, nBits = 8, nTables = 4,
          droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value))
        .orderBy("query_id", "neighbor_id")
    }),
    // The build-once/query-many ANN shape a 100 TB deployment actually
    // runs: IVF index WRITTEN partitioned-by-cell, REOPENED from disk,
    // probed through the partition-pruned scan (IvfIndexSpec asserts
    // PartitionFilters on this exact path and value-equality with the
    // in-memory x14 form).
    "x25_ann_served" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      val corpus = emb.filter(col("vec_id") =!= 0)
      // per-sf path: concurrent runs over different sf dirs must not
      // overwrite each other's index mid-read
      val idxPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x25_ivf_index_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      val built = ops.Ann.Ivf.buildIndex(corpus, "vec_id", "embedding",
        nlist = 8, sampleN = 400)
      ops.Ann.Ivf.writeIndex(built, idxPath)
      val served = ops.Ann.Ivf.openIndex(s, idxPath, "vec_id", "embedding")
      ops.Ann.Ivf.topKIndexed(served, q, 10, nProbe = 2)
    }),
    // Served-index INGESTION: the index is built once on the existing
    // corpus, new vectors arrive later and are assigned to the frozen
    // centroids (one narrow pass, no retrain, no corpus read), landing as
    // epoch partitions under each cell — probes stay partition-pruned and
    // see the appended vectors. Value-equal to rebuilding with the same
    // centroids over the union (spec-pinned), replay-idempotent.
    "x34_ann_ivf_appended" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val q = queryVector(emb, dir)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val idxPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x34_ivf_appended_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      val base = corpus.filter(col("vec_id") % 5 =!= 0)
      val shard = corpus.filter(col("vec_id") % 5 === 0)
      ops.Ann.Ivf.writeIndex(
        ops.Ann.Ivf.buildIndex(base, "vec_id", "embedding",
          nlist = 8, sampleN = 400), idxPath)
      ops.Ann.Ivf.appendToIndex(s, idxPath, shard, "embedding", epoch = 1L)
      val served = ops.Ann.Ivf.openIndex(s, idxPath, "vec_id", "embedding")
      ops.Ann.Ivf.topKIndexed(served, q, 10, nProbe = 2)
    }),
    // The served BATCH k-NN shape: the corpus side of the similarity join
    // as a WRITTEN bucket table (partitionBy(tbl, bucket, epoch), with
    // per-key counts beside it — the viral-bucket cap applies at probe
    // time from the counts, so ingestion epochs stay rebuild-exact),
    // probed by a broadcast query batch through a partition-pruned scan —
    // value-equal to the in-memory x21 rebucketing form (spec-pinned,
    // incl. a pruning assertion on the bucket scan).
    "x31_knn_join_served" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val idxPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x31_knn_corpus_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      val acc = s.sparkContext.longAccumulator("x31_dropped_rows")
      ops.Ann.writeKnnCorpus(emb, "vec_id", "embedding", idxPath,
        dim = 64, nBits = 8, nTables = 4)
      val served = ops.Ann.openKnnCorpus(s, idxPath)
      ops.Ann.knnJoinServed(served, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding", k = 3, droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value))
        .orderBy("query_id", "neighbor_id")
    }),
    // Served k-NN corpus INGESTION: 80% of the corpus written as the base
    // build, the rest folded in as an epoch append (bucketed with the
    // STORED planes — no corpus reprocess); the probe over the appended
    // corpus is value-equal to x31's single-build form over the same
    // vectors (spec-pinned) — including the combined probe-time cap.
    "x35_knn_join_appended" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val idxPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x35_knn_appended_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      val acc = s.sparkContext.longAccumulator("x35_dropped_rows")
      ops.Ann.writeKnnCorpus(emb.filter(col("vec_id") % 5 =!= 0),
        "vec_id", "embedding", idxPath, dim = 64, nBits = 8, nTables = 4)
      ops.Ann.appendToKnnCorpus(s, idxPath,
        emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding", epoch = 1L)
      val served = ops.Ann.openKnnCorpus(s, idxPath)
      ops.Ann.knnJoinServed(served, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding", k = 3, droppedRows = Some(acc))
        .withColumn("dropped_rows", lit(acc.value))
        .orderBy("query_id", "neighbor_id")
    }),
    // T7 scale path — distributed two-pass prefix-sum packing (the window
    // twin t07_seq_pack is the value-exact oracle; PackSpec pins equality)
    "x22_seq_pack" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("ntok"))
      ops.Pack.packOffsets(docs, "doc_id", "ntok", seqLen = 512)
        .orderBy("doc_id")
    }),
    // A7 scale path — t-digest-style approximate quantiles (mergeable
    // sketch, bounded memory per group; deterministic for a given input
    // so the driver's rows check is stable)
    "x24_value_quantiles_approx" -> ((s: SparkSession, dir: String) => {
      runShared(
        """SELECT l_returnflag,
          | approx_percentile(l_extendedprice, array(0.25, 0.5, 0.95), 10000) AS qs
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
          .stripMargin.replace("\n", " "))(s, dir)
        .selectExpr("l_returnflag", "round(qs[0], 2) AS q25",
          "round(qs[1], 2) AS q50", "round(qs[2], 2) AS q95")
    }),
    "x10_entity_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // tag entities over raw text (P16 heuristic path), A1 window dedup
      val tag = udf((id: String, t: String) => graft.extract.Entities.tagEntities(id, t))
      val ents = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"), col("text"))
        .select(col("doc_id"), explode(tag(col("doc_id"), col("text"))).as("e"))
        .select(col("doc_id"), col("e.text").as("text"), col("e.entity_type").as("entity_type"),
          col("e.start_pos").as("start_pos"), col("e.end_pos").as("end_pos"),
          col("e.confidence").as("confidence"))
      graft.extract.Entities.dedupWindow(ents).orderBy("doc_id", "entity_type", "start_pos")
    }),
    "x12_media_frames" -> ((s: SparkSession, dir: String) => {
      // multimodal frame sampling over REAL decoded payloads — one row
      // per sampled frame per media item. withMeta = false: frameSample
      // reads only the payload, so the header decode would be a second
      // full container parse per item thrown away (r7 optimization; the
      // output columns never included the header fields)
      val media = ops.Media.mediaTable(gen.Corpus.corpus(s, dir),
        ops.Media.ImageIoCodec, withMeta = false)
      ops.Media.frameSample(media, 4, ops.Media.ImageIoCodec)
        .orderBy("doc_id", "media_ref", "frame_idx")
    }),
    "x15_media_resize" -> ((s: SparkSession, dir: String) => {
      // real decode -> bilinear rescale -> re-encode; the binary payload is
      // projected to (length, md5) so the driver comparator sees scalars
      val media = ops.Media.mediaTable(gen.Corpus.corpus(s, dir), ops.Media.ImageIoCodec)
      ops.Media.withResized(media, 16, 16)
        .select(col("doc_id"), col("media_ref"), col("src_width"), col("src_height"),
          length(col("resized")).as("resized_bytes"), md5(col("resized")).as("resized_md5"))
        .orderBy("doc_id", "media_ref")
    }),
    // Audio modality — REAL WAV containers (javax.sound.sampled): synth
    // PCM -> RIFF encode -> header + sample decode -> windowed RMS /
    // zero-crossing features, one row per (clip, window)
    "x26_audio_features" -> ((s: SparkSession, dir: String) => {
      val audio = ops.Media.audioTable(gen.Corpus.corpus(s, dir))
      ops.Media.audioFeatures(audio, windows = 4)
        .orderBy("doc_id", "media_ref", "window_idx")
    }),
    "x11_sampleby" -> ((s: SparkSession, dir: String) => {
      // DataFrameStatFunctions.sampleBy — the reference's stratified
      // sampling (openai_contract_explorer.py:229-310) via the built-in
      // (seeded; the deterministic md5 variant is d05, oracle-checked)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      docs.stat.sampleBy("lang",
        Map("en" -> 0.3, "es" -> 0.6, "de" -> 0.6, "fr" -> 0.6, "zh" -> 0.6),
        42L).select("doc_id", "lang").orderBy("doc_id")
    }),
    // SNK9 — schema export (validation/schema.py:64-100): the engine's
    // model schemas as (model, pos, field, sql_type, nullable) rows,
    // derived from the LIVE encoders so any model drift breaks the golden
    // oracle (a literal VALUES table in oracleSql).
    "v04_schema_export" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val models = Seq(
        "contract" -> Encoders.product[graft.model.ContractRow].schema,
        "lineage" -> Encoders.product[graft.model.LineageRec].schema,
        "span" -> Encoders.product[graft.model.Span].schema)
      models.flatMap { case (m, sch) =>
        sch.fields.zipWithIndex.map { case (f, i) =>
          (m, i, f.name, f.dataType.simpleString, if (f.nullable) 1 else 0)
        }
      }.toDF("model", "pos", "field", "sql_type", "nullable")
        .orderBy("model", "pos")
    }),
    // D9 scale path — 13-gram hash-equi-join decontamination over a
    // corpus/bench split of the planted contract texts (the oracle-exact
    // substring form for small benches is d09_decontaminate;
    // DecontaminateSpec pins this operator against brute-force gram
    // intersect). Bench side reduces to distinct gram hashes -> broadcast.
    "x18_decontaminate_grams" -> ((s: SparkSession, dir: String) => {
      val docs = runShared(
        s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")(s, dir)
      ops.Decontaminate.contaminated(
          docs.filter("doc_id % 10 <> 7"), "doc_id", "ctext",
          docs.filter("doc_id % 10 = 7"), "ctext", n = 13)
        .orderBy("doc_id")
    }),
    // The bloom-runtime-filter form of x18 — for bench sets too large to
    // broadcast: corpus grams are pruned by a bloom over the bench gram
    // hashes BELOW their first exchange; false positives die in the exact
    // join, so the result is row-identical to x18 and shares its
    // value-exact DuckDB oracle.
    "x33_decontaminate_bloom" -> ((s: SparkSession, dir: String) => {
      val docs = runShared(
        s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")(s, dir)
      ops.Decontaminate.contaminatedPrefiltered(
          docs.filter("doc_id % 10 <> 7"), "doc_id", "ctext",
          docs.filter("doc_id % 10 = 7"), "ctext", n = 13)
        .orderBy("doc_id")
    }),
    // Graded decontamination — the threshold-filtering form: every corpus
    // doc scored (n_grams, n_hits, overlap_ratio). Value-exact oracle
    // (TrainingQueries.X27OracleDuck, gram-string re-derivation).
    "x27_contamination_score" -> ((s: SparkSession, dir: String) => {
      val docs = runShared(
        s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")(s, dir)
      ops.Decontaminate.overlapScore(
          docs.filter("doc_id % 10 <> 7"), "doc_id", "ctext",
          docs.filter("doc_id % 10 = 7"), "ctext", n = 13)
        .orderBy("doc_id")
    }),
    // Intra-corpus duplicated-gram scoring (ExactSubstr-style boilerplate
    // signal) — value-exact oracle TrainingQueries.X29OracleDuck
    "x29_selfdup_score" -> ((s: SparkSession, dir: String) => {
      val docs = runShared(
        s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")(s, dir)
      ops.Decontaminate.selfDupScore(docs, "doc_id", "ctext", n = 13)
        .orderBy("doc_id")
    }),
    // ExactSubstr-style duplicated-span REMOVAL (the action form of x29):
    // shared 13-gram runs survive only in the min-id doc; every other doc
    // is rebuilt without the covered words. Value-exact oracle
    // (TrainingQueries.X39OracleDuck) — the rebuilt TEXT itself is
    // hash-compared against an independent DuckDB re-derivation.
    "x39_substr_dedup" -> ((s: SparkSession, dir: String) => {
      val docs = runShared(
        s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")(s, dir)
      ops.Decontaminate.removeDupSpans(docs, "doc_id", "ctext", n = 13)
        .orderBy("doc_id")
    }),
    // Span removal SERVED: the corpus's duplicated-gram set persisted as
    // a bucketed index; the newest tranche is scrubbed of corpus
    // boilerplate with NO corpus re-read (corpus seniority + in-shard
    // keeper rule). Shard ids are larger than every corpus id, so the
    // result is value-equal to the full corpus∪shard run restricted to
    // the shard — pinned against exactly that DuckDB twin
    // (TrainingQueries.X41OracleDuck, a green hash-compare).
    "x41_substr_dedup_served" -> ((s: SparkSession, dir: String) => {
      val docs = runShared(
        s"SELECT doc_id, ${graft.queries.Dialect.Ctext} AS ctext FROM documents")(s, dir)
      val t = runShared("SELECT CAST(floor((max(doc_id) + 1) * 3 / 4) AS BIGINT) AS t FROM documents")(s, dir)
        .head().getLong(0)
      val table = s"gi_x41_${Integer.toHexString(dir.hashCode)}"
      ops.Decontaminate.writeGramIndex(
        docs.filter(col("doc_id") < t), "ctext", table)
      ops.Decontaminate.removeDupSpansServed(
          docs.filter(col("doc_id") >= t), "doc_id", "ctext",
          ops.Decontaminate.openGramIndex(s, table))
        .orderBy("doc_id")
    }),
    // The full north-rule flow in one operator: positioned lines -> layout
    // -> interleaved spans -> contract extraction. Value-exact oracle
    // (LayoutQueries.X23OracleDuck): the l0* layout CTEs composed with the
    // block-fold extraction SQL, sharing the SAME line-text derivation
    // (LayoutQueries.LineTextCase) — the whole composition is
    // hash-compared vs an independent DuckDB re-derivation.
    "x23_layout_extract" -> ((s: SparkSession, dir: String) => {
      val lines = runShared(
        "WITH " + LayoutQueries.Lines.replace("\n", " ") +
          " SELECT doc, line_id, x0, y0, x1, y1, " +
          LayoutQueries.LineTextCase + " AS text FROM lines")(s, dir)
      flatContracts(graft.extract.Layout.extractFromLines(lines).toDF())
        .orderBy("doc_id")
    }),
    // L1-L5 typed twin — the distributed Marker-style layout pass
    // (extract/Layout.scala): same page geometry as the l0* oracle queries,
    // laid out by the typed per-page operator (one shuffle on doc, then a
    // narrow fold). LayoutSpec pins typed == l04 SQL value-exact.
    "x17_layout_typed" -> ((s: SparkSession, dir: String) => {
      val lines = runShared(
        "WITH " + LayoutQueries.Lines.replace("\n", " ") + " SELECT * FROM lines")(s, dir)
      graft.extract.Layout.layoutBlocks(lines).orderBy("doc", "block_id")
    }),
    // A1 dedup-merge, DIRECT value-exact form: the REAL Entities.dedupWindow
    // operator over a SQL-derivable planted entity set with engineered
    // duplicate groups (case/padding variants, cross-format dates, tied
    // confidences). Oracle: ExtractQueries.A11OracleDuck re-derives the set
    // and applies the normalization-keyed A1 window independently. x10 stays
    // the full tagEntities composition (rows-only — the tagger is a loopy
    // cursor fold DuckDB cannot reproduce).
    "a11_entity_dedup" -> ((s: SparkSession, dir: String) => {
      val ents = runShared(
        ExtractQueries.a11EntitySet(graft.queries.Dialect.Spark))(s, dir)
      graft.extract.Entities.dedupWindow(ents)
        .orderBy("doc_id", "entity_type", "start_pos")
    }),
    "x09_boiler_strip" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      gen.Corpus.corpus(s, dir).map { d =>
        val kept = graft.extract.Extract.stripBoilerplate(d.spans)
        (d.doc_id, d.spans.size, kept.size,
          d.spans.count(_.kind == "html"), kept.count(_.kind == "paragraph"))
      }.toDF("doc_id", "n_spans", "n_kept", "n_html", "n_paragraphs")
        .orderBy("doc_id")
    }),
    // Domain mix SERVED from the maintained stats table (ops.Mix): the
    // stats are built on the older tranche and the rest arrives as an
    // ingested epoch — the mix assigned from baseline + epoch must equal
    // the corpus-scan query over the union, so this is pinned against
    // d14's OWN DuckDB oracle (value-exact, not rows-only). The arithmetic
    // shares TrainingQueries.MixSql with the SQL tier by construction.
    "x36_domain_mix_served" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x36_mix_stats_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Mix.writeStats(docs.filter(col("doc_id") % 4 =!= 3), path)
      ops.Mix.appendStats(docs.filter(col("doc_id") % 4 === 3), path, epoch = 1L)
      ops.Mix.assign(docs, ops.Mix.rates(ops.Mix.openStats(s, path)))
        .orderBy("doc_id")
    }),
    // Quality probe SERVED (ops.Probe): the 24-iteration GD chain runs
    // ONCE to fit and persist the five-number model; scoring is a single
    // narrow pass with a broadcast model join. Trained on this same
    // corpus, the served scores must equal the in-query t13 run — pinned
    // against t13's OWN DuckDB oracle (value-exact, not rows-only).
    "x37_quality_probe_served" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x37_probe_model_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Probe.writeModel(docs, path)
      ops.Probe.score(docs, ops.Probe.openModel(s, path)).orderBy("doc_id")
    }),
    // Bigram LM SERVED (ops.Lm): the per-language character-bigram model
    // is fitted and persisted ONCE (two hash aggs to KB-sized probability
    // tables), then any shard scores in one narrow pass with broadcast
    // model joins. Trained on this same corpus the served scores must
    // equal the in-query t14 run — pinned against t14's OWN DuckDB oracle
    // (value-exact, not rows-only). LmSpec covers the unseen-shard
    // smoothing fallbacks the gate corpus never exercises.
    "x40_lm_served" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x40_lm_model_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Lm.writeModel(docs, path)
      ops.Lm.score(docs, ops.Lm.openModel(s, path)).orderBy("doc_id")
    }),
    // LM drift SERVED (ops.Lm.driftStats): the retrain trigger run the
    // way deployment runs it — model + cuts persisted once, the drift
    // shard (the same deterministic corpus slice + planted junk as x42)
    // scored in one pass against the broadcast model, per-language
    // below-cut fractions aggregated. Pinned against x42's OWN DuckDB
    // oracle: the served alarm equals the all-SQL twin value-exactly
    // (identical quantized scores, identical half-min cuts).
    "x43_lm_drift_served" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x43_lm_model_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Lm.writeModel(docs, path)
      val junk = Seq("de", "en", "es", "fr", "zh").flatMap { l =>
        val stem = s"91${l.map(_.toInt).mkString}"
        Seq((s"${stem}01".toLong, l,
          "xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz"),
          (s"${stem}02".toLong, l,
            "qvxk zjqw kvxz jqzv xkqj vzqx wkjq zxvq jkqz vqxj kzjv qxwz"))
      }.toDF("doc_id", "lang", "text")
      val shard = docs.filter(col("doc_id") % 100 === 3).unionByName(junk)
      ops.Lm.driftStats(shard, ops.Lm.openModel(s, path))
        .select(col("lang"), col("n_docs"), col("n_below"),
          col("below_frac"), col("retrain").cast("int").as("retrain"))
        .orderBy("lang")
    }),
    // The whole incremental curation loop (pipeline.Curation): bootstrap
    // every serving structure on the older tranche, then curate the
    // newest tranche as an incoming shard — exact/near dedup against the
    // persisted index, 13-gram decontamination vs the bench split, the
    // served probe's quality gate, and served-mix copy counts, in the
    // d11 first-hit order. Rows-only by harness contract (the minhash
    // probe is xxhash64); every stage is individually oracle- or
    // spec-gated, and CurationSpec pins the composition incl. the
    // accept-then-catch property.
    "x38_curation_e2e" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"), col("lang"))
      val corpus = docs.filter(col("doc_id") % 4 =!= 3)
      val shard = docs.filter(col("doc_id") % 4 === 3)
      val hex = Integer.toHexString(dir.hashCode)
      val ixs = pipeline.Curation.Indexes(
        minhashTable = s"mh_x38_$hex",
        statsPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_x38_stats_$hex").getAbsolutePath,
        modelPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_x38_model_$hex").getAbsolutePath,
        lmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_x38_lm_$hex").getAbsolutePath)
      pipeline.Curation.bootstrap(corpus, ixs)
      val bench = docs.filter(col("doc_id") % 10 === 7)
        .select(col("text").as("snippet"))
      pipeline.Curation.curateShard(s, shard, corpus, ixs, bench, "snippet")
        .orderBy("doc_id")
    }),
    // The FULL curation loop, scrub included (pipeline.Curation with
    // gramTable set, requireScrub = true): bootstrap builds the served
    // duplicated-gram index beside the other serving state, the incoming
    // shard is SCRUBBED of corpus boilerplate before any decision
    // (RefinedWeb order; text-preserving rebuild, so untouched docs pass
    // through verbatim), then the d11 decision chain runs on the cleaned
    // text. A planted full clone of indexed corpus content scrubs to
    // empty and drops at the first empty-doc gate. Output carries the
    // per-doc scrub count (words removed) beside the decision. Rows-only
    // by harness contract (xxhash64 gram/minhash probes); the scrub is
    // value-pinned by x41 + DecontaminateSpec, the composition by
    // CurationSpec/StreamingCurationSpec.
    "x44_curation_scrubbed" -> ((s: SparkSession, dir: String) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"), col("lang"))
      // id-threshold split (not modulo): the gram/minhash index contract
      // wants every shard id above every indexed id
      val t = docs.agg(ceil(max(col("doc_id")) * 3L / 4L)).head().getLong(0)
      val corpus = docs.filter(col("doc_id") < t)
      val clone = corpus.orderBy("doc_id").limit(1)
        .select((col("doc_id") + lit(90000000L)).as("doc_id"), col("text"),
          col("source"), col("lang"))
      val shardRaw = docs.filter(col("doc_id") >= t).unionByName(clone)
      val hex = Integer.toHexString(dir.hashCode)
      val ixs = pipeline.Curation.Indexes(
        minhashTable = s"mh_x44_$hex",
        statsPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_x44_stats_$hex").getAbsolutePath,
        modelPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_x44_model_$hex").getAbsolutePath,
        lmPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_x44_lm_$hex").getAbsolutePath,
        gramTable = Some(s"gx_x44_$hex"))
      pipeline.Curation.bootstrap(corpus, ixs, requireScrub = true)
      val bench = docs.filter(col("doc_id") % 10 === 7)
        .select(col("text").as("snippet"))
      val scrubbed = pipeline.Curation.scrubShard(s, shardRaw, ixs)
      val nWords = "size(filter(split(lower(regexp_replace(text, " +
        "'[^a-zA-Z0-9]+', ' ')), ' '), w -> length(w) > 0))"
      val scrubCount = shardRaw
        .selectExpr("doc_id", s"$nWords AS n_raw")
        .join(scrubbed.selectExpr("doc_id", s"$nWords AS n_kept"), "doc_id")
        .selectExpr("doc_id", "n_raw - n_kept AS n_scrubbed_words")
      pipeline.Curation
        .curateShard(s, scrubbed, corpus, ixs, bench, "snippet")
        .join(scrubCount, "doc_id")
        .orderBy("doc_id")
    }),
    // The LM drift alarm CLOSED into its ACTION (ops.Lm.retrainModel):
    // phase 'before' is x43's served alarm (fires on the planted junk);
    // then the model RETRAINS on the grown corpus — documents plus the
    // junk register the stream now carries — and republishes through the
    // crash-safe versioned pointer (graft.io.Models: complete v1 lands,
    // THEN CURRENT moves; a crash leaves readers on v0). Phase 'after'
    // scores the SAME shard against the refit half-min cuts: the junk's
    // own scores define each language's training minimum, so the alarm
    // clears deterministically. Value-exact vs a DuckDB twin that
    // re-derives BOTH models and both drift passes in pure SQL
    // (X45OracleDuck) — the retrain ACTION itself is oracle-gated, not
    // just the trigger.
    "x45_lm_retrain" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x45_lm_model_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Lm.writeModel(docs, path)
      val junk = Seq("de", "en", "es", "fr", "zh").flatMap { l =>
        val stem = s"91${l.map(_.toInt).mkString}"
        Seq((s"${stem}01".toLong, l,
          "xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz"),
          (s"${stem}02".toLong, l,
            "qvxk zjqw kvxz jqzv xkqj vzqx wkjq zxvq jkqz vqxj kzjv qxwz"))
      }.toDF("doc_id", "lang", "text")
      val shard = docs.filter(col("doc_id") % 100 === 3).unionByName(junk)
      def phaseRows(phase: String, version: Long) =
        ops.Lm.driftStats(shard, ops.Lm.openModel(s, path))
          .select(lit(phase).as("phase"), col("lang"), col("n_docs"),
            col("n_below"), col("below_frac"),
            col("retrain").cast("int").as("retrain"),
            lit(version).as("version"))
      // bound BEFORE the retrain: openModel dereferences the pointer at
      // call time, so this plan reads v0 (which the publish never touches)
      val before = phaseRows("before", io.Models.current(path))
      val v1 = ops.Lm.retrainModel(docs.unionByName(junk), path)
      before.unionByName(phaseRows("after", v1))
        .orderBy("phase", "lang")
    }),
    // The PROBE drift alarm closed into its action (ops.Probe
    // .retrainModel): phase 'before' fires on a junk-flooded shard
    // (keep fraction collapses vs the persisted training keep rate);
    // the refit then re-runs the FULL 24-iteration in-engine GD chain on
    // the grown corpus and republishes through the versioned pointer.
    // Phase 'after' measures the representative stream (the grown corpus
    // itself): its keep fraction equals the refit train_keep_rate by
    // construction — drift 0, quiet. (The probe gates junk OUT by
    // design, so the junk shard would keep alarming under ANY fit —
    // unlike the LM's register-adapting cut; this is RetrainSpec's
    // convergence posture.) Value-exact vs a DuckDB twin re-deriving
    // BOTH GD fits (X46OracleDuck) — with x45, both model retrain
    // actions are oracle-gated end to end.
    "x46_probe_retrain" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_x46_probe_model_${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      ops.Probe.writeModel(docs, path)
      val junk = (0 until 20).map(i => (920000L + i,
        "xqzj wvkx qjzx vbdg kxqz jxqv zzqk xjvq qkzx vjxq zqxk jqvz"))
        .toDF("doc_id", "text")
      val shard = docs.filter(col("doc_id") % 100 === 3).unionByName(junk)
      def phaseRow(phase: String, over: DataFrame, version: Long) =
        ops.Probe.driftStats(over, ops.Probe.openModel(s, path))
          .select(lit(phase).as("phase"), col("n_docs"), col("n_keep"),
            col("keep_frac"), col("train_keep_rate"), col("drift"),
            col("retrain").cast("int").as("retrain"),
            lit(version).as("version"))
      // bound BEFORE the retrain: openModel dereferences the pointer at
      // call time, so this plan reads v0 (which the publish never touches)
      val grown = docs.unionByName(junk)
      val before = phaseRow("before", shard, io.Models.current(path))
      val v1 = ops.Probe.retrainModel(grown, path)
      before.unionByName(phaseRow("after", grown, v1)).orderBy("phase")
    })
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    shared.map { case (name, (sparkSql, _)) =>
      name -> ((s: SparkSession, dir: String) => runShared(sparkSql)(s, dir))
    } ++ pipelineQueries

  /** Hand-pinned golden for v04_schema_export (SNK9): if a model field is
    * added/renamed/retyped, the live-encoder dump stops matching this
    * literal and the driver flags it. */
  private val SchemaExportOracle: String = {
    val rows = Seq(
      ("contract", Seq(("doc_id", "string", 1), ("title", "string", 1),
        ("contract_number", "string", 1), ("currency", "string", 1),
        ("total_value", "double", 1), ("effective_date", "string", 1),
        ("expiration_date", "string", 1), ("client_name", "string", 1),
        ("vendor_name", "string", 1), ("contract_type", "string", 1),
        ("emails", "array<string>", 1), ("cnpj_cpf", "array<string>", 1),
        ("table_count", "int", 0), ("key_clauses", "array<string>", 1),
        ("n_sections", "int", 0), ("confidence", "double", 0))),
      ("lineage", Seq(("doc_id", "string", 1), ("partition_id", "int", 0),
        ("stage", "string", 1), ("status", "string", 1),
        ("op_hash", "string", 1), ("snapshot_id", "string", 1),
        ("ts", "bigint", 0))),
      ("span", Seq(("kind", "string", 1), ("text", "string", 1),
        ("media_ref", "string", 1), ("offset", "int", 0))))
    val values = rows.flatMap { case (m, fs) =>
      fs.zipWithIndex.map { case ((n, t, nul), i) => s"('$m', $i, '$n', '$t', $nul)" }
    }.mkString(", ")
    s"SELECT * FROM (VALUES $values) AS t(model, pos, field, sql_type, nullable) ORDER BY model, pos"
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Fixed path of the synthesized-span parquet dump (gen.Corpus
    * .dumpSpans, written by Verify/ProbeQ once per sweep) — the bridge
    * that lets DuckDB oracle-check corpus-derived queries it could never
    * synthesize itself. */
  val CorpusSpansDump = "/tmp/graft_corpus_spans"

  /** x09's independent DuckDB twin over the span dump: the P26 density
    * predicate (same arithmetic as the oracle-green p26_boiler) applied
    * to every html span, non-html spans pass through, content html
    * rewrites to a paragraph — re-deriving (n_spans, n_kept, n_html,
    * n_paragraphs) per document without running any Scala. */
  private val X09OracleDuck: String =
    s"""WITH s AS (
       | SELECT doc_id, kind, text,
       |  CASE WHEN kind = 'html' THEN regexp_replace(text, '<[^>]+>', '', 'g') END AS stripped,
       |  CASE WHEN kind = 'html' THEN coalesce(list_sum(list_transform(
       |   regexp_extract_all(text, '(?i)<a[^>]*>(.*?)</a>', 1),
       |   x -> length(regexp_replace(x, '<[^>]+>', '', 'g')))), 0) END AS link_chars
       | FROM read_parquet('$CorpusSpansDump/*.parquet')
       |), k AS (
       | SELECT doc_id, kind,
       |  CASE WHEN kind <> 'html' THEN 1
       |       WHEN length(text) > 0
       |        AND length(stripped) * 1e0 / length(text) >= 0.35
       |        AND link_chars * 1e0 / nullif(length(stripped), 0) <= 0.33 THEN 1
       |       ELSE 0 END AS kept
       | FROM s
       |)
       |SELECT doc_id,
       | CAST(count(*) AS INT) AS n_spans,
       | CAST(sum(kept) AS INT) AS n_kept,
       | CAST(sum(CASE WHEN kind = 'html' THEN 1 ELSE 0 END) AS INT) AS n_html,
       | CAST(sum(CASE WHEN kept = 1 AND kind IN ('paragraph', 'html') THEN 1 ELSE 0 END) AS INT) AS n_paragraphs
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")

  def oracleSql: Map[String, String] =
    shared.map { case (name, (_, duckSql)) => name -> duckSql } +
      ("v04_schema_export" -> SchemaExportOracle) +
      // x09 rides the span DUMP (gen.Corpus.dumpSpans): the live Scala
      // synthesizer + stripBoilerplate on the Spark side vs a pure-SQL
      // density re-derivation over the dumped rows on the DuckDB side
      ("x09_boiler_strip" -> X09OracleDuck) +
      ("d07_dedup_components" -> TrainingQueries.D07OracleDuck) +
      ("d08_embed_components" -> TrainingQueries.D08OracleDuck) +
      // deterministic typed operators get direct DuckDB oracles too:
      // the distributed implementation is hash-compared against an
      // independent re-derivation, not just the spec-level parity
      ("x17_layout_typed" -> LayoutQueries.X17OracleDuck) +
      ("x18_decontaminate_grams" -> TrainingQueries.X18OracleDuck) +
      ("x22_seq_pack" -> shared("t07_seq_pack")._2) +
      ("x23_layout_extract" -> LayoutQueries.X23OracleDuck) +
      ("x04_chunks" -> ExtractQueries.X04OracleDuck) +
      ("x27_contamination_score" -> TrainingQueries.X27OracleDuck) +
      ("x33_decontaminate_bloom" -> TrainingQueries.X18OracleDuck) +
      ("x29_selfdup_score" -> TrainingQueries.X29OracleDuck) +
      ("x39_substr_dedup" -> TrainingQueries.X39OracleDuck) +
      ("x41_substr_dedup_served" -> TrainingQueries.X41OracleDuck) +
      ("a11_entity_dedup" -> ExtractQueries.A11OracleDuck) +
      // the served mix must reproduce the corpus-scan query exactly —
      // same oracle as d14
      ("x36_domain_mix_served" -> shared("d14_domain_mix")._2) +
      // the served probe must reproduce the in-query training run —
      // same oracle as t13
      ("x37_quality_probe_served" -> shared("t13_quality_probe")._2) +
      // the served LM must reproduce the in-query scoring run —
      // same oracle as t14
      ("x40_lm_served" -> shared("t14_lm_score")._2) +
      // the served drift alarm must reproduce the all-SQL twin —
      // same oracle as x42
      ("x43_lm_drift_served" -> shared("x42_lm_drift")._2) +
      // the retrain ACTION: before/after drift vs a DuckDB twin that
      // re-derives both the bootstrap and the refit model in pure SQL
      ("x45_lm_retrain" -> TrainingQueries.X45OracleDuck) +
      // the probe retrain action: both GD fits re-derived in pure SQL
      ("x46_probe_retrain" -> TrainingQueries.X46OracleDuck)
}
