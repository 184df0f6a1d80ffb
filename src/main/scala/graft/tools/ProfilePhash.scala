package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.SparkEntry

/** mm_phash_dedup A/B + scale harness (r17, VERDICT r16 #1) — dev tool.
  *
  * Usage: runMain graft.tools.ProfilePhash <dumpTag> [<synthDir>]
  *
  * Dumps the entry's CURRENT output at sf0.001/sf0.01/sf0.1 to
  * /tmp/phash_<dumpTag>_<sf>.parquet (the bit-identical anchor for a
  * rewrite A/B — run once pre-change, once post-change, compare with
  * exceptAll both ways), then, if a synth dir is given, times the entry
  * there (2 reps, persistent-RDD sweep between reps, same convention as
  * ScaleProof).
  */
object ProfilePhash {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val synth = args.lift(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val out = s"/tmp/phash_${tag}_$sf.parquet"
      SparkEntry.queries("mm_phash_dedup")(spark, s"/root/testdata/$sf")
        .write.mode(SaveMode.Overwrite).parquet(out)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val n = spark.read.parquet(out).count()
      println(s"[phash] dumped $sf rows=$n -> $out")
    }

    synth.foreach { dir =>
      (1 to 2).foreach { rep =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries("mm_phash_dedup")(spark, dir).count()
        println(f"[phash] synth rep$rep rows=$n ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
