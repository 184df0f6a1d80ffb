package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Times one catalog entry end-to-end, twice (cold/warm), after the same
  * table warm the bench does — local profiling aid, not part of the
  * catalog. Usage: runMain graft.tools.ProfileEntry <key> [key2 ...]
  */
object ProfileEntry {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    args.foreach { key =>
      val fn = SparkEntry.queries(key)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[profile] $key run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
