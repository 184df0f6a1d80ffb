package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Same-JVM interleaved A/B of the `graft.cc.fuse` knob on the CC-based
  * dedup entries (BASELINE.md perf methodology) — dev tool, not catalog.
  * Usage: runMain graft.tools.ProfileCcFuse <key> <fuseA> <fuseB> [reps]
  */
object ProfileCcFuse {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val key = args(0)
    val variants = args.drop(1).take(2).map(_.toInt)
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    // warm pass (codegen/JIT) before any measured rep
    spark.conf.set("graft.cc.fuse", variants.head.toString)
    SparkEntry.queries(key)(spark, sfDir).count()
    val acc = scala.collection.mutable.Map[Int, List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { rep =>
      variants.foreach { f =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        Tables.names.foreach { n =>
          val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
        }
        spark.conf.set("graft.cc.fuse", f.toString)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(key)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[ccfuse] $key fuse=$f rep$rep rows=$n $s%7.2f s")
        acc(f) = s :: acc(f)
      }
    }
    variants.foreach { f =>
      val xs = acc(f)
      println(f"[ccfuse:summary] fuse=$f min=${xs.min}%.2f med=${xs.sorted.apply(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
