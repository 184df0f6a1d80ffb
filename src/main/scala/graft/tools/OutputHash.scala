package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Canonical output fingerprint for A/B-ing no-oracle entries across
  * refactors (the DistinctValue helper extraction must be bit-identical):
  * runs each key, sorts rows by every column, prints rowcount + a 64-bit
  * fold of the row strings. Two trees printing the same line for a key
  * produced the SAME multiset of rows.
  *
  * Usage: runMain graft.tools.OutputHash <sfDir> key1 key2 ...
  */
object OutputHash {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { key =>
      val df = SparkEntry.queries(key)(spark, sfDir)
      val rows = df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
        .collect()
      var h = 1125899906842597L
      rows.foreach { r => h = h * 31 + r.toString.hashCode }
      println(s"[abhash] $key rows=${rows.length} hash=$h")
      graft.queries.Util.sweepEntryCaches(spark)
    }
    spark.stop()
  }
}
