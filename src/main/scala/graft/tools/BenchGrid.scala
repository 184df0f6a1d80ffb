package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Full-catalog same-JVM A/B over session conf modes (r14 floor work,
  * VERDICT r13 #1). FloorProbe attributed the sub-second floor to
  * per-job driver gap (AQE runs one job per shuffle stage) and per-task
  * dispatch+deserialize; this grid measures what each candidate session
  * posture does to the WHOLE catalog — total seconds, plus the worst
  * per-entry regressions vs the baseline mode, so a floor win cannot
  * silently buy a heavy-entry parallelism collapse (sp caps the initial
  * shuffle partition count; AQE coalesces DOWN only).
  *
  * Modes (aqe, sp, initialPartitionNum):
  *   base : on,  32, unset — the shipping Bench posture
  *   sp8  : on,   8, unset — judge-suggested low session-wide sp
  *   sp8i : on,   8, 64    — low sp but AQE shuffles still start at 64
  *   noaqe: off,  8, unset — the cheap-class winner in FloorProbe
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.BenchGrid [reps]
  */
object BenchGrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    try {
      graft.queries.ScanQueries.warmStaging(spark, sfDir)
      graft.queries.StreamQueries.warmStaging(spark, sfDir)
      graft.queries.JoinQueries.warmStaging(spark, sfDir)
      graft.queries.GraphQueries.warmShared(spark, sfDir)
      graft.queries.VectorQueries.warmShared(spark, sfDir)
      graft.queries.TextQueries.warmShared(spark, sfDir)
    } catch { case e: Throwable => System.err.println(s"[grid] staging warm: $e") }
    val tableRdds = spark.sparkContext.getPersistentRDDs.keySet
    val entries = SparkEntry.queries.toSeq.sortBy(_._1)

    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!tableRdds.contains(id)) rdd.unpersist(blocking = true)
      }

    // untimed JIT/codegen warm at sf0.001 (same rationale as Bench)
    val warmSf = "/root/testdata/sf0.001"
    entries.foreach { case (name, fn) =>
      try fn(spark, warmSf).count()
      catch { case e: Throwable => System.err.println(s"[grid] warm $name: $e") }
      sweep()
    }

    // round-15 question (VERDICT r14 #3): with sp=8 + AQE settled, do the
    // coalesce knobs move the per-entry floor? parallelismFirst=false makes
    // AQE coalesce toward advisoryPartitionSizeInBytes instead of maximum
    // parallelism (fewer, bigger partitions → fewer task dispatches on the
    // 176 sub-0.5 s entries); the advisory sweep brackets the size target.
    // All modes keep aqe=on + sp8 (the r14 winners).
    val PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    val ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val modes: Seq[(String, Map[String, String])] = Seq(
      ("base",   Map.empty),
      ("pf",     Map(PF -> "false")),
      ("pf16m",  Map(PF -> "false", ADV -> "16m")),
      ("pf256m", Map(PF -> "false", ADV -> "256m")))
    val allKeys = modes.flatMap(_._2.keys).distinct
    val times = scala.collection.mutable.Map[(String, String), Double]()
    for (rep <- 1 to reps; (mode, confs) <- modes) {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      allKeys.foreach(spark.conf.unset)
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      var total = 0.0
      entries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        sweep(); System.gc()
        val k = (mode, name)
        times(k) = math.min(times.getOrElse(k, Double.MaxValue), dt)
        total += dt
      }
      println(f"[grid] rep$rep mode=$mode%-5s total=$total%7.1f s over ${entries.size} entries")
    }
    // per-entry regressions vs the FIRST mode (best-of-reps), worst first
    val baseMode = modes.head._1
    for ((mode, _) <- modes.drop(1)) {
      val regs = entries.map(_._1).map { name =>
        val b = times((baseMode, name)); val m = times((mode, name))
        (name, b, m, m - b)
      }.sortBy(-_._4)
      println(s"[grid] worst regressions $mode vs base:")
      regs.take(8).foreach { case (n, b, m, d) =>
        println(f"[grid]   $n%-28s base=$b%6.2f $mode=$m%6.2f delta=+$d%5.2f")
      }
      val better = regs.count(_._4 < -0.05)
      val worse = regs.count(_._4 > 0.05)
      println(f"[grid] $mode: ${better} entries >50ms faster, ${worse} >50ms slower, " +
        f"sum-of-best ${regs.map(_._3).sum}%7.1f vs base ${regs.map(_._2).sum}%7.1f")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
