package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.LongAccumulator

/** Coverage-loss surfacing for the bucket-cap guards (the brief's "no
  * silent caps" rule): every candidate generator that drops over-cap
  * buckets takes an optional accumulator and COUNTS what it drops, so an
  * empty result is distinguishable from a genuinely dup-free corpus —
  * the r2 x13 failure mode (cap silently swallowing the whole corpus)
  * becomes visible in Bench/Demo output instead of reading as "no dups".
  */
object DropStats {

  /** A boolean pass-through filter that adds every rejected row to `acc`.
    * Accumulator updates from transformations are at-least-once under
    * task retries/cache misses — treat the count as an operational
    * coverage metric, not an exact ledger. */
  def countingKeep(acc: Option[LongAccumulator]): UserDefinedFunction =
    udf { keep: Boolean =>
      if (!keep) acc.foreach(_.add(1))
      keep
    }

  /** Apply the cap predicate: plain codegen'd filter when nobody asked for
    * the count, counting UDF filter (breaks whole-stage codegen for that
    * one stage) only when an accumulator is supplied. */
  def cappedFilter(df: org.apache.spark.sql.DataFrame,
                   keep: org.apache.spark.sql.Column,
                   acc: Option[LongAccumulator]): org.apache.spark.sql.DataFrame =
    acc match {
      case Some(_) => df.filter(countingKeep(acc)(keep))
      case None => df.filter(keep)
    }
}
