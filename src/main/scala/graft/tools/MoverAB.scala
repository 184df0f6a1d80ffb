package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** VERDICT r14 #4 — settle the two driver-tail movers
  * (`text_perplexity_kn` 1.23→2.10 s, `vec_lsh_ann` 0.74→1.14 s between
  * the r13 and r14 driver runs). Both entry bodies are UNCHANGED since
  * r13 (git -S), and neither touches the r14 warmShared artifacts, so the
  * only shipped posture delta that could explain a real regression is
  * shuffle.partitions 32→8. This tool interleaves the two postures on the
  * same keys in ONE JVM (3 reps each, strict alternation), then prints
  * the single-thread calib constant, so the comparison is immune to the
  * cross-boot host variance that motivated the check in the first place.
  *
  * Verdict rule: if sp8 ≈ sp32 for a key, the driver delta was boot
  * noise; if sp8 is consistently slower, the r14 posture is the source
  * and the finding goes to BASELINE.md (with the fix decision).
  *
  * Usage: runMain graft.tools.MoverAB [key ...]   (defaults to the two movers)
  */
object MoverAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keys = if (args.nonEmpty) args.toSeq
               else Seq("text_perplexity_kn", "vec_lsh_ann")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    val tableRdds = spark.sparkContext.getPersistentRDDs.keySet
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!tableRdds.contains(id)) rdd.unpersist(blocking = true)
      }
      System.gc()
    }
    // untimed JIT warm (generated code is input-independent)
    keys.foreach { k =>
      try SparkEntry.queries(k)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[ab] warm $k: $e") }
      sweep()
    }
    val times = scala.collection.mutable.Map[(String, String), List[Double]]()
    for (rep <- 1 to 3; sp <- Seq("32", "8"); key <- keys) {
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(key)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      sweep()
      times((key, sp)) = dt :: times.getOrElse((key, sp), Nil)
      println(f"[ab] rep$rep sp=$sp%-2s $key%-22s rows=$n%8d $dt%6.2f s")
    }
    keys.foreach { key =>
      val a = times((key, "32")); val b = times((key, "8"))
      println(f"[ab:summary] $key%-22s sp32 best=${a.min}%5.2f med=${a.sorted.apply(1)}%5.2f | " +
        f"sp8 best=${b.min}%5.2f med=${b.sorted.apply(1)}%5.2f")
    }
    val calib = {
      val t0 = System.nanoTime()
      var acc = 0L; var i = 0L
      while (i < 200000000L) { acc += i * i; i += 1 }
      if (acc == 42L) println("")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[ab] calib_sec=$calib%.3f")
    spark.stop()
  }
}
