package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** AQE skew-join probe at 10× (dev tool, round 13 — the runtime
  * counterpart of the catalog's MANUAL salting entry `join_skew_salted`,
  * same evidence class as `BloomProbe`).
  *
  * Manufactures a genuinely skewed equi-join on the synth corpus: ~90%
  * of the 6M-row fact collapses onto one hot key (measured: reduce
  * partition 29 carries 5,415,808 rows vs a ~19k median), the dim side
  * is written to parquet and read back, broadcast is disabled so the
  * join is the SMJ shape AQE's OptimizeSkewedJoin targets, and the skew
  * thresholds are lowered to local partition sizes (the defaults are
  * cluster-sized for the same reason BloomProbe documents for the bloom
  * rule). Checks:
  *   1. the final adaptive plan actually marks the join
  *      `SortMergeJoin(skew=true)` (rule VERIFIED IN-PLAN, not assumed);
  *   2. results are identical with the rule on and off;
  *   3. honest same-JVM interleaved timings for both settings.
  *
  * Two pattern-match traps this probe had to step around — both REAL
  * operational facts about AQE skew handling at any scale, documented in
  * BASELINE.md:
  *   - OptimizeSkewedJoin requires BOTH join children to be
  *     Sort ← ShuffleQueryStage(ENSURE_REQUIREMENTS) DIRECTLY. A
  *     post-shuffle aggregate (e.g. the dim built via .distinct()) or a
  *     TableCacheQueryStage (a cached dim whose partitioning the join
  *     reuses) between Sort and the shuffle silently disables skew
  *     mitigation for the whole join.
  *   - Dataset.head() (and .write) execute a DIFFERENT QueryExecution
  *     than the probed one; assert plan markers only on a
  *     queryExecution whose own toRdd/collect ran.
  *   - A skewed reduce partition is split along MAP-OUTPUT ranges, so a
  *     partition fed by a single mapper (one input file at spec scale)
  *     can never be split — the PlanShapeSpec twin repartitions to 8
  *     mappers to pin the rule at sf0.001 (found there; at this probe's
  *     10× scale the fact naturally has many mappers).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sfsynth1 runMain graft.tools.SkewProbe
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfsynth1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    li.cache(); li.count()
    // ~90% of rows collapse to key 0 — one hot shuffle partition
    val fact = li.withColumn("k",
      when(pmod(col("l_orderkey"), lit(10)) < 9, lit(0L)).otherwise(col("l_orderkey")))
    // dim via a parquet round-trip, NOT .distinct()-in-plan or .cache():
    // either of those leaves a non-shuffle node under the join's Sort and
    // OptimizeSkewedJoin's pattern no longer matches (see scaladoc)
    val dimPath = s"${sys.props("java.io.tmpdir")}/graft_skewprobe_dim"
    fact.select(col("k")).distinct()
      .withColumn("w", pmod(col("k"), lit(97)).cast("long"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    def run(): (Long, Double, Boolean, Double) = {
      val t0 = System.nanoTime()
      val j = fact.join(dim, "k")
        .select(count(lit(1)).as("n"),
          sum(col("l_quantity") * col("w")).as("s"))
      val r = j.collect()(0) // THIS queryExecution must run (not head/write)
      val sec = (System.nanoTime() - t0) / 1e9
      val planStr = j.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      (r.getLong(0), r.getDouble(1), planStr.contains("skew=true"), sec)
    }

    // local-sized thresholds (defaults are cluster-sized): a partition is
    // "skewed" past 2 MB and 2x the median — the hot key qualifies
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    run() // untimed JIT/cache warm
    for (rep <- 1 to 3; on <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      val (n, s, skewed, sec) = run()
      println(f"[skew] rep$rep enabled=$on%-5s n=$n%9d sum=$s%18.4f " +
        f"planSkewSplit=$skewed%-5s $sec%6.2f s")
    }
    spark.stop()
  }
}
