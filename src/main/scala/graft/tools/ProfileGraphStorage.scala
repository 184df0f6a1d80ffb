package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** VERDICT r17 #3 — test the one-box graph-heap attribution instead of
  * asserting it. The 100× residuals (graph_triangle_count 363.6 s at
  * exponent 1.26, graph_jaccard_neighbors 297.7 s) were attributed to
  * GC pressure from ~120 M deserialized cached edge rows; this tool
  * A/Bs that claim by interleaving storage postures for the graph-family
  * caches (graft.graph.storageLevel knob) in ONE JVM on the same corpus:
  *
  *   MEMORY_ONLY          — the shipped .cache() posture (control)
  *   MEMORY_AND_DISK_SER  — one compact serialized copy per block
  *
  * If the serialized posture flattens the wall, the attribution is
  * confirmed AND the fix ships as the knob's documented one-box setting;
  * if not, the exponent is the closure's own physics and BASELINE.md
  * records the negative with numbers.
  *
  * Usage: SCALE_DIR=/tmp/sfsynth2 runMain graft.tools.ProfileGraphStorage [key ...]
  */
object ProfileGraphStorage {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SCALE_DIR", "/tmp/sfsynth2")
    val keys = if (args.nonEmpty) args.toSeq
               else Seq("graph_triangle_count", "graph_jaccard_neighbors")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cached = Tables.names.map { n =>
      val df = Tables.load(spark, dir, n); df.cache(); df.count(); df
    }
    def calib(): Double = {
      val t0 = System.nanoTime(); var acc = 0L; var i = 0L
      while (i < 200000000L) { acc += i * i; i += 1 }
      if (acc == 42L) println("")
      (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = {
      // drop EVERYTHING the entry or the shared memo persisted — the memo
      // must rebuild per posture (its storage level is set at build), so
      // evict the memo MAP through its own hook (Dataset-level unpersist +
      // map clear; ADVICE r18: the raw RDD unpersist below leaves the
      // CacheManager entry registered and the memo map still pointing at
      // the stale frame, so every posture after the first measured a dead
      // memo block instead of rebuilding at the new level)
      graft.queries.GraphQueries.clearEdgeCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      cached.foreach(_.cache()); cached.foreach(_.count())
      System.gc()
    }
    // a "<LEVEL>+ckpt" posture additionally flips graft.graph.checkpoint
    // (r19: localCheckpoint the oriented/top-w frames — lineage truncated)
    val postures = sys.env.get("SPARK_GRAFT_POSTURES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("MEMORY_ONLY", "MEMORY_AND_DISK_SER"))
    // untimed JIT warm at tiny SF
    keys.foreach { k =>
      try SparkEntry.queries(k)(spark, "/root/testdata/sf0.001").count()
      catch { case scala.util.control.NonFatal(e) => System.err.println(s"[gstore] warm $k: $e") }
    }
    sweep()
    val res = scala.collection.mutable.Map[(String, String), List[Double]]()
    (1 to 2).foreach { rep =>
      postures.foreach { p =>
        spark.conf.set("graft.graph.storageLevel", p.stripSuffix("+ckpt"))
        spark.conf.set("graft.graph.checkpoint", p.endsWith("+ckpt").toString)
        keys.foreach { k =>
          sweep()
          val t0 = System.nanoTime()
          try {
            val n = SparkEntry.queries(k)(spark, dir).queryExecution.toRdd.count()
            val s = (System.nanoTime() - t0) / 1e9
            println(f"[gstore] rep$rep $p%-20s $k%-26s rows=$n%8d $s%8.2f s calib=${calib()}%.3f")
            res((k, p)) = s :: res.getOrElse((k, p), Nil)
          } catch {
            case scala.util.control.NonFatal(e) =>
              println(s"[gstore] rep$rep $p $k FAILED: ${e.getClass.getSimpleName}: " +
                s"${Option(e.getMessage).getOrElse("").take(200)}")
          }
        }
      }
    }
    keys.foreach { k =>
      val lines = postures.flatMap { p =>
        res.get((k, p)).map(ts => f"$p=${ts.min}%.1fs(best of ${ts.size})")
      }
      println(s"[gstore:summary] $k ${lines.mkString("  ")}")
    }
    spark.stop()
  }
}
