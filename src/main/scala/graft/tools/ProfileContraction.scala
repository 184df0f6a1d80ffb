package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Same-JVM interleaved A/B for the r14 segment-contraction pre-pass
  * (graft.dedup.starContraction) over the two chain-candidate propagation
  * entries. Prints per-run seconds, output row count (must be identical
  * across modes — connectivity equivalence check rides along), and the
  * ccLabels round count (graft.cc.debug, the mechanism under test).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileContraction
  */
object ProfileContraction {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.cc.debug", "true")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    val keys = Seq("dedup_minhash_lsh", "dedup_cluster_lsh")
    val tableRdds = spark.sparkContext.getPersistentRDDs.keySet
    // untimed warm (codegen/JIT for both plan shapes)
    for (key <- keys; mode <- Seq("true", "false")) {
      spark.conf.set("graft.dedup.starContraction", mode)
      try SparkEntry.queries(key)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[warm] $key: $e") }
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!tableRdds.contains(id)) rdd.unpersist(blocking = true)
      }
    }
    // grid: contraction on/off × ccLabels fuse depth (the 2-round result
    // makes SHALLOWER fusion a candidate — each fused step deepens every
    // round's plan, and with 2 rounds total there is little to amortize)
    val grid = Seq(("false", "3"), ("false", "2"), ("false", "1"), ("true", "3"))
    for (rep <- 1 to 3; (mode, fuse) <- grid; key <- keys) {
      spark.conf.set("graft.dedup.starContraction", mode)
      spark.conf.set("graft.cc.fuse", fuse)
      val warmRdds = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(key)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!warmRdds.contains(id)) rdd.unpersist(blocking = true)
      }
      System.gc()
      println(f"[ab] rep$rep contraction=$mode%-5s fuse=$fuse $key%-20s $dt%6.2f s rows=$n%7d")
    }
    spark.conf.set("graft.cc.fuse", "3")
    spark.stop()
  }
}
