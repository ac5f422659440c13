package graft

import org.apache.spark.sql.SparkSession

/** One scaling measurement per JVM (running local[8] and local[32]
  * sequentially in one JVM contaminates the second measurement with GC
  * debris and JIT state — measured 5x distortion). Orchestrated by
  * tools/scaling.sh which runs this twice and writes BENCH/BASELINE.md.
  *
  * Usage: runMain graft.ScalingBench <cores> [sfDir] [replicate]
  * Prints: {"cores":N,"wall_sec":S,"docs":D,"docs_per_sec":T}
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val replicate = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // two warmup passes (JIT + codegen + first-GC transients), then three
    // timed passes. Concurrent multi-JVM runs show a ~10x cold transient
    // that can bleed past a single warmup when four JVMs JIT/GC in phase;
    // the second warmup absorbs it so the timed passes measure steady
    // state. Wall times still vary with host CPU steal (±30% measured) —
    // min is the least-contended sample, median the robust one.
    pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir, replicate)).count()
    pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir, replicate)).count()
    var n = 0L
    val passes = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      n = pipeline.Pipeline.extract(gen.Corpus.corpus(spark, sfDir, replicate)).count()
      (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    val best = passes.min
    val median = passes.sorted.apply(1)
    val passJson = passes.map(p => f"$p%.3f").mkString("[", ",", "]")
    println(f"""{"cores":$cores,"wall_sec":$best%.3f,"median_sec":$median%.3f,"docs":$n,"docs_per_sec":${n / best}%.1f,"median_docs_per_sec":${n / median}%.1f,"pass_secs":$passJson}""")
  }
}
