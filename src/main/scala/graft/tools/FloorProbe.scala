package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Fixed-overhead floor profiler (VERDICT r12 #3, extended r14 per
  * VERDICT r13 #1) — dev tool.
  *
  * The driver bench spends ~92 s of its ~187 s total on ~257 entries that
  * each run under ~0.5 s: per-action floor, not compute. This probe splits
  * that floor for a set of representative cheap entries into phases —
  *   build  : entry function call → DataFrame (includes Tables.load)
  *   plan   : force queryExecution.executedPlan (analyze + optimize +
  *            physical planning + AQE prep)
  *   run1   : first .count() (codegen compile on first touch + scheduling
  *            + execution)
  *   run2   : second .count() of the SAME DataFrame (codegen + JIT warm ⇒
  *            pure scheduling + execution; run1 − run2 ≈ compile cost)
  * and counts the jobs/stages/tasks each run phase dispatched (task count
  * × per-task dispatch is the scheduling component; AQE multiplies job
  * count by materializing each shuffle stage as its own job).
  *
  * Config levers are A/B'd same-JVM interleaved (the only comparable
  * layout — cross-boot totals are host-noise-dominated):
  *   aqe=on/off   : spark.sql.adaptive.enabled — AQE replans per shuffle
  *                  stage; for sub-second entries the replan/job overhead
  *                  can exceed what coalescing saves
  *   sp=32/8      : spark.sql.shuffle.partitions — map-side task count of
  *                  every shuffle stage (AQE coalesces the REDUCE side
  *                  only; the shuffle write still runs `sp` tasks? no —
  *                  the map task count = parent partitions; sp sets the
  *                  reduce-side bucket count, which without AQE is the
  *                  reduce task count)
  *
  * Usage: runMain graft.tools.FloorProbe [key ...]   (defaults below)
  */
object FloorProbe {
  private class Counter extends SparkListener {
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    // per-task metric sums (ms): where does the per-job wall actually go?
    //   sched  = launch latency (task launch − stage submit, per task)
    //   deser  = executorDeserializeTime (task binary + cached-plan graph)
    //   run    = executorRunTime
    //   gc     = jvmGCTime
    val schedMs = new AtomicLong; val deserMs = new AtomicLong
    val runMs = new AtomicLong; val gcMs = new AtomicLong
    private val stageSubmit = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
      stages.incrementAndGet()
      stageSubmit.put(s.stageInfo.stageId, System.currentTimeMillis())
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val sub = stageSubmit.getOrDefault(t.stageId, t.taskInfo.launchTime)
      schedMs.addAndGet(math.max(0L, t.taskInfo.launchTime - sub))
      Option(t.taskMetrics).foreach { m =>
        deserMs.addAndGet(m.executorDeserializeTime)
        runMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def snap(): Array[Long] = Array(jobs.get, stages.get, tasks.get,
      schedMs.get, deserMs.get, runMs.get, gcMs.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    val keys = if (args.nonEmpty) args.toSeq else Seq(
      "scalar_casts", "str_basic", "filter_compound", "join_inner_equi",
      "agg_having", "win_ntile", "set_intersect", "sort_multi_limit")

    // listener events are async; a short drain keeps the per-phase counts
    // attributable (untimed — this is a dev probe, not the bench)
    // returns (result, counter deltas, MEASURED drain seconds): sleep(80)
    // guarantees only a lower bound, so the caller must subtract the
    // actual drain time, not a constant — a loaded host can oversleep by
    // tens of ms per call, which would inflate run1/run2 (these numbers
    // fed the sp=8 decision; a constant subtraction could also go negative)
    def drained[A](f: => A): (A, Array[Long], Double) = {
      val d0 = System.nanoTime()
      Thread.sleep(80)
      val before = counter.snap()
      val d1 = System.nanoTime()
      val r = f
      val d2 = System.nanoTime()
      Thread.sleep(80)
      val after = counter.snap()
      val d3 = System.nanoTime()
      val drain = ((d1 - d0) + (d3 - d2)) / 1e9
      (r, after.zip(before).map { case (a, b) => a - b }, drain)
    }

    def fmt(c: Array[Long]): String =
      s"j${c(0)}/s${c(1)}/t${c(2)} sched=${c(3)}ms deser=${c(4)}ms " +
        s"exec=${c(5)}ms gc=${c(6)}ms"

    def phases(key: String): String = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(key)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      val (_, c1, d1) = drained { df.count() }
      val t3 = System.nanoTime()
      val (_, c2, d2) = drained { df.count() }
      val t4 = System.nanoTime()
      // drained sleeps inside the t2..t3/t3..t4 spans; subtract the
      // MEASURED drain durations (not the nominal 160 ms — see drained)
      val r1 = (t3 - t2) / 1e9 - d1
      val r2 = (t4 - t3) / 1e9 - d2
      f"build=${(t1 - t0) / 1e9}%6.3f plan=${(t2 - t1) / 1e9}%6.3f " +
        f"run1=$r1%6.3f(${fmt(c1)}) " +
        f"run2=$r2%6.3f(${fmt(c2)})"
    }

    // untimed JIT warm (same rationale as Bench's warm pass)
    keys.foreach { k => try SparkEntry.queries(k)(spark, sfDir).count()
                        catch { case _: Throwable => () } }

    val modes = Seq(("true", "32"), ("false", "32"), ("true", "8"), ("false", "8"))
    for (rep <- 1 to 3; (aqe, sp) <- modes; key <- keys) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      println(f"[floor] rep$rep aqe=$aqe%-5s sp=$sp%-2s $key%-20s ${phases(key)}")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
