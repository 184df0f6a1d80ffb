package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage attribution for `dedup_simhash_cluster`'s 100× cliff (r17) —
  * dev tool, not catalog. Times and counts each stage of the cluster
  * spelling in isolation: fingerprints, distinct values, value-level
  * Hamming-ball pairs, rep-space edges, and the ccLabels propagation —
  * so the fix targets the stage that actually owns the 266 s, instead of
  * a guess (the pair-entry experience: the mass could be candidate
  * enumeration, the CC edge passes, or the doc fan-out).
  *
  * Usage: ProfileSimhashCc <sfDir>
  */
object ProfileSimhashCc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    spark.conf.set("graft.cc.debug", "true")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val maxHamming = graft.GraftConf.simhashMaxHamming(spark)
    val sim = graft.queries.TextQueries.simhashValues(spark, sfDir).cache()
    val nDocs = timed("simhashValues")(sim.count())
    val nVals = timed("distinct values")(sim.select(col("simhash")).distinct().count())
    val valPairs = graft.queries.TextQueries.simhashValuePairs(sim, maxHamming).cache()
    val nPairs = timed("simhashValuePairs")(valPairs.count())
    val repIds = sim.groupBy(col("simhash")).agg(min(col("doc_id")).as("rep_id")).cache()
    timed("repIds")(repIds.count())
    val edges = valPairs
      .join(repIds.select(col("simhash").as("sh_a"), col("rep_id").as("src")), "sh_a")
      .join(repIds.select(col("simhash").as("sh_b"), col("rep_id").as("dst")), "sh_b")
      .select(col("src"), col("dst")).cache()
    val nEdges = timed("rep edges")(edges.count())
    val labels = timed("ccLabels")(
      graft.queries.TextQueries.ccLabels(edges).cache())
    val nLab = timed("labels count")(labels.count())
    val nComp = timed("components")(labels.select(col("comp")).distinct().count())
    println(s"[profile] docs=$nDocs distinctVals=$nVals valPairs=$nPairs " +
      s"repEdges=$nEdges labeledReps=$nLab components=$nComp")
    spark.stop()
  }
}
