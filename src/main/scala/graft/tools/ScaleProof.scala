package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Same-JVM interleaved scale measurement (VERDICT r11 #1) — dev tool.
  *
  * For each catalog key, times the entry against TWO SF directories in one
  * JVM, strictly interleaved (base, synth, base, synth), two reps per pair.
  * Cross-boot totals are host-noise-dominated (BASELINE.md methodology), so
  * this is the only layout from which a growth ratio may be quoted.
  *
  * Both directories' tables are cached up front (same warm the bench does —
  * scan cost is excluded; what's measured is the operator's own work), and
  * persistent RDDs are swept before EVERY run so entry-internal caches
  * can't make a rep dishonest. Driver-side model memos (PQ codebooks, BPE
  * merge tables) are keyed by sfDir: rep1 carries the full training cost,
  * rep2 shows the memoized steady state — both are printed.
  *
  * Usage:
  *   SCALE_BASE=/root/testdata/sf0.1 SCALE_SYNTH=/tmp/sfsynth1 \
  *     runMain graft.tools.ScaleProof key1 key2 ...
  */
object ScaleProof {
  def main(args: Array[String]): Unit = {
    val base  = sys.env.getOrElse("SCALE_BASE", "/root/testdata/sf0.1")
    val synth = sys.env.getOrElse("SCALE_SYNTH", "/tmp/sfsynth1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cached = Seq(base, synth).flatMap { dir =>
      Tables.names.map { n =>
        val df = Tables.load(spark, dir, n); df.cache(); df.count(); df
      }
    }

    def time(key: String, dir: String): Double = {
      // sweep entry-internal persists, but NOT the warmed table cache
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      cached.foreach(_.cache())
      cached.foreach(_.count())
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(key)(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $key%-24s ${if (dir == base) "base " else "synth"} " +
        f"rows=$n%9d $s%8.2f s")
      s
    }

    val rows = args.map { key =>
      val b1 = time(key, base);  val s1 = time(key, synth)
      val b2 = time(key, base);  val s2 = time(key, synth)
      val (bw, sw) = (math.min(b1, b2), math.min(s1, s2))
      println(f"[scale:summary] $key%-24s base=$bw%7.2f s  synth=$sw%7.2f s  " +
        f"ratio=${sw / bw}%6.2fx  (rep1 $b1%.2f/$s1%.2f, rep2 $b2%.2f/$s2%.2f)")
      (key, b1, s1, b2, s2)
    }
    println("key,base1,synth1,base2,synth2")
    rows.foreach { case (k, b1, s1, b2, s2) =>
      println(f"$k,$b1%.2f,$s1%.2f,$b2%.2f,$s2%.2f")
    }
    spark.stop()
  }
}
