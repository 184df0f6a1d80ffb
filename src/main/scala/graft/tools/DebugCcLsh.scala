package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: dedup_cluster_lsh refinement + pair recall vs the
  * exact dedup_cluster_cc at an arbitrary sf (CcSpec pins sf0.001; this
  * measures bigger corpora). */
object DebugCcLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = graft.Catalog.byKey("dedup_cluster_cc").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = graft.Catalog.byKey("dedup_cluster_lsh").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pairCount(m: Map[Long, Long]): Long =
      m.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    // refinement: every LSH cluster must sit inside one exact cluster
    val broken = lsh.groupBy(_._2).values.count { g =>
      g.keys.map(exact.get).toSet.size != 1
    }
    val exactPairs = pairCount(exact)
    val lshPairs = pairCount(lsh)
    println(s"sf=$sfDir nodes exact=${exact.size} lsh=${lsh.size}")
    println(s"clusters exact=${exact.values.toSet.size} lsh=${lsh.values.toSet.size}")
    println(s"refinement-violating LSH clusters=$broken")
    println(f"pair recall=${lshPairs.toDouble / exactPairs}%.4f ($lshPairs / $exactPairs)")
    spark.stop()
  }
}
