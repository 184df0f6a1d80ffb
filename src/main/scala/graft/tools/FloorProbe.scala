package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Fixed-overhead floor profiler (VERDICT r12 #3) — dev tool.
  *
  * The driver bench spends ~40 s of its ~200 s total on ~170 entries that
  * each run under 0.5 s: per-action floor, not compute. This probe splits
  * that floor for a set of representative cheap entries into its phases —
  *   build   : entry function call → DataFrame (includes Tables.load,
  *             i.e. file listing + footer schema + relation analysis when
  *             the Tables memo is off)
  *   plan    : force queryExecution.executedPlan (analyze + optimize +
  *             physical planning + AQE prep)
  *   run     : .count() (codegen compile on first touch, scheduling, exec)
  * and A/Bs the `graft.tables.memo` flag same-JVM interleaved (the only
  * comparable layout — cross-boot totals are host-noise-dominated).
  *
  * Usage: runMain graft.tools.FloorProbe [key ...]   (defaults below)
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    val keys = if (args.nonEmpty) args.toSeq else Seq(
      "scalar_casts", "str_basic", "filter_compound", "join_inner_equi",
      "agg_having", "win_ntile", "set_intersect", "sort_multi_limit")

    def phases(key: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(key)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis->physical planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }

    // untimed JIT warm (same rationale as Bench's warm pass)
    keys.foreach { k => try SparkEntry.queries(k)(spark, sfDir).count()
                        catch { case _: Throwable => () } }

    for (rep <- 1 to 3; memo <- Seq("true", "false"); key <- keys) {
      spark.conf.set("graft.tables.memo", memo)
      val (b, p, r) = phases(key)
      println(f"[floor] rep$rep memo=$memo%-5s $key%-20s " +
        f"build=$b%6.3f plan=$p%6.3f run=$r%6.3f total=${b + p + r}%6.3f")
    }
    spark.stop()
  }
}
