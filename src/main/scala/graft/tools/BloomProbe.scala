package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Runtime bloom-filter join-pruning probe (VERDICT r11 #7 / SURVEY §8.1
  * backlog #4) — dev tool, not catalog.
  *
  * Exercises Catalyst's InjectRuntimeFilter on the 10× synth corpus: a
  * fact⋈dim join whose dim side is selectively filtered should get a
  * `bloom_filter_agg`-built `might_contain` predicate pushed into the
  * fact scan, pruning shuffle input at runtime. The default thresholds
  * target cluster-sized inputs (application side ≥ 10 GB), so the probe
  * lowers them to the synth corpus's scale — the assertion is that the
  * RULE fires and the plan carries the filter, plus an interleaved A/B
  * of the same query with the rule disabled.
  *
  * Usage: SCALE_SYNTH=/tmp/sfsynth1 runMain graft.tools.BloomProbe
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SCALE_SYNTH", "/tmp/sfsynth1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // make the injection decision reachable at local-test scale
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1MB")
      // the filtered dim fits a broadcast, which leaves no shuffle join
      // for the rule to protect — force the SMJ path the rule targets
      // (at real 100-TB scale both sides exceed the broadcast threshold
      // on their own, so SMJ is the honest shape to probe)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))

    def run(label: String, enabled: Boolean): Double = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", enabled.toString)
      val t0 = System.nanoTime()
      val r = q.collect()(0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bloom] $label%-10s rev=${r.getDouble(0)}%.2f n=${r.getLong(1)} $s%6.2f s")
      s
    }

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val optimized = q.queryExecution.optimizedPlan.toString
    val injected = optimized.contains("might_contain")
    println(s"[bloom] runtime filter injected into optimized plan: $injected")
    if (!injected)
      println("[bloom] plan excerpt:\n" + optimized.linesIterator.take(12).mkString("\n"))

    // interleaved A/B, 3 reps each, warm pass first
    run("warm", enabled = true)
    val on = (1 to 3).map(_ => run("bloom=on", enabled = true))
    val off = (1 to 3).map(_ => run("bloom=off", enabled = false))
    println(f"[bloom:summary] injected=$injected on_min=${on.min}%.2f off_min=${off.min}%.2f")
    spark.stop()
  }
}
