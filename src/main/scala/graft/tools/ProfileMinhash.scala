package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Stage-split profile of `dedup_minhash_lsh` (dev tool, round 13).
  *
  * The entry is the catalog's most expensive after the chain-candidate
  * re-spec; this probe separates its two phases per rep so the next
  * optimization targets the right one:
  *   stage1 : minhashRepStage(chain=true) forced via repPairs.count() —
  *            tokenize/canonicalize, signature explode+agg, banding,
  *            s chain windows, exact-Jaccard verify
  *   stage2 : full entry count minus stage1 — ccLabels propagation
  *            rounds, membership fan-out, size agg, output sort
  *            (runs over the caches stage1 left warm, same as inside
  *            the entry)
  * Persistent RDDs are swept between reps like ScaleProof so rep2 shows
  * the steady state, not stage1's leftover caches.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileMinhash
  */
object ProfileMinhash {
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
    (1 to 3).foreach { rep =>
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val (_, _, repPairs, _) =
        graft.queries.TextQueries.minhashRepStage(spark, sfDir, chainCandidates = true)
      val nPairs = repPairs.count()
      val t1 = System.nanoTime()
      val n = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"[mh] rep$rep repPairs=$nPairs%7d stage1=${(t1 - t0) / 1e9}%6.2f s " +
        f"entryAfterWarm=${(t2 - t1) / 1e9}%6.2f s rows=$n%7d")
    }
    spark.stop()
  }
}
