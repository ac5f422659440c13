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
}
