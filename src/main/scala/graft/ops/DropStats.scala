package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.LongAccumulator

/** Coverage-loss surfacing for the bucket-cap guards (the brief's "no
  * silent caps" rule): every candidate generator that drops over-cap
  * buckets takes an optional accumulator and COUNTS what it drops, so an
  * empty result is distinguishable from a genuinely dup-free corpus —
  * the r2 x13 failure mode (cap silently swallowing the whole corpus)
  * becomes visible in Bench/Demo output instead of reading as "no dups".
  */
object DropStats {

  /** Apply the cap predicate as a plain codegen'd filter. When an
    * accumulator is supplied, the EXACT number of rejected rows is counted
    * by one eager aggregate over the same frame and added to it ONCE, at
    * call time — not by a per-row UDF inside the returned plan. A UDF
    * count is at-least-once under task retries and double-evaluates when
    * the filtered frame sits on both sides of a self-join (every caller
    * here self-joins it), which overcounted drops up to 6x; the eager
    * aggregate costs one extra small job only when the count is requested
    * and keeps the returned plan fully codegen'd. */
  def cappedFilter(df: DataFrame, keep: Column, acc: Option[LongAccumulator]): DataFrame = {
    acc.foreach(_.add(df.filter(!keep).count()))
    df.filter(keep)
  }

  /** Drop every row whose `keys`-bucket holds more than `maxBucket` rows,
    * WITHOUT a window: over-cap keys come from a `groupBy(keys).count()`
    * (partial+final hash aggregate, no sort) and are removed by a
    * left-anti join on the same keys. The r3 form — `count(*) OVER
    * (PARTITION BY keys)` — forced a full shuffle+SORT of the bucketed
    * corpus per table; at 10^12 rows that sort was the single heaviest
    * avoidable cost in the dedup tier. The over-cap key list is tiny by
    * construction (<= n/maxBucket keys), so the anti-join is
    * broadcast-able, and its shuffle key equals the self-join key the
    * callers apply next, so the exchange is reused. Semantics are
    * row-identical to the window form; drops are counted exactly via one
    * cheap aggregate over the over-cap keys when `acc` is supplied.
    *
    * Broadcast safety: the over-cap key list is data-dependent (up to
    * n/maxBucket keys — ~10^8 at 10^12 rows with maxBucket=10^4), and a
    * skewed corpus could push a forced broadcast past what the driver
    * holds. When `acc` is supplied, the SAME eager aggregate that counts
    * dropped rows also counts over-cap KEYS, and above `maxBroadcastKeys`
    * the cap join falls back to a shuffled-hash join (still sort-free:
    * the probe side is already partitioned on `keys`, only the tiny-ish
    * key list shuffles, and the hash build avoids SortMergeJoin's sorts).
    * The uncounted fast path (`acc = None`) adds no extra job and keeps
    * the forced broadcast — its operating limit is `maxBroadcastKeys`
    * over-cap keys, i.e. corpora where more than maxBucket*maxBroadcastKeys
    * rows sit in degenerate buckets need the counting form. */
  def capByKey(df: DataFrame, keys: Seq[String], maxBucket: Int,
               acc: Option[LongAccumulator],
               maxBroadcastKeys: Long = 4L << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    // The upstream subtree (signature/bucket computation — regex
    // shingles, minhashes, hyperplane dots) is the expensive part, and
    // this operator references it twice (over-cap aggregate + the kept
    // rows); the caller's self-join references the result twice more.
    // Spark does not share common subtrees — only canonically-identical
    // exchanges reuse, and the r5 reuse engineering (`_reuse_pin`, an
    // unused xxhash64 aggregate meant to stop column pruning from
    // specializing the over-cap branch) no longer survives Spark 4.1's
    // optimizer: the pin is pruned, the branch's scan narrows to the
    // bucket-key columns, the exchanges stop being identical, and the
    // signature pass runs FOUR times (measured: 4 scans, 0 reuse markers
    // in the executed plan). r7 replaces optimizer-shape coaxing with an
    // explicit lineage cut:
    //  - repartition on the bucket key, then LAZY localCheckpoint: the
    //    signature pass + its one exchange materialize exactly once, on
    //    the first consumer's action;
    //  - Dataset.localCheckpoint preserves outputPartitioning, so the
    //    over-cap aggregate, the kept-rows probe, and both sides of the
    //    caller's self-join all read the checkpointed blocks with NO
    //    further exchange — the rows are 3-4 longs each (keys + id), so
    //    the pinned blocks are a tiny fraction of the corpus text;
    //  - the cap stays a LEFT join + IS NULL filter (left_anti would be
    //    pushed below the repartition and re-split the subtree);
    //  - the over-cap key list is broadcast: it holds at most one key
    //    per maxBucket over-cap rows (degenerate buckets are rare by
    //    nature), and a non-broadcast plan would sort-merge — the exact
    //    sort this operator exists to avoid.
    // Net plan: ONE signature pass, ONE exchange, hash aggregates only,
    // no Sort anywhere (plan-guarded in PlanShapeSpec).
    val keyed = df.repartition(keys.map(col): _*).localCheckpoint(false)
    val overCap = keyed.groupBy(keys.map(col): _*)
      .agg(count("*").as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)
    // one eager job serves both the exact drop count and the
    // broadcast-safety decision; without `acc` no extra job runs and the
    // broadcast stays forced (documented operating limit above)
    val oversizeKeyList = acc.exists { a =>
      val row = overCap
        .agg(coalesce(sum("bucket_n"), lit(0L)), count("*")).head()
      a.add(row.getLong(0))
      row.getLong(1) > maxBroadcastKeys
    }
    val marked = overCap.select(keys.map(col) :+ lit(true).as("_over"): _*)
    val rhs = if (oversizeKeyList) marked.hint("shuffle_hash") else broadcast(marked)
    keyed.join(rhs, keys, "left")
      .filter(col("_over").isNull).drop("_over")
  }
}
