package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Stage-by-stage timing of the dedup_minhash_lsh pipeline — local
  * profiling aid (not part of the catalog). Each stage is materialized
  * with a count so the printed number isolates that stage's cost on top
  * of its (cached) inputs.
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TextFunctions.ensureRegistered(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val nHashes = 40; val bands = 5; val rowsPerBand = nHashes / bands
    // mirrors the production entry: SORTED distinct tokens (the native
    // sorted-merge intersect requires sorted inputs)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), sort_array(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("fp", md5(array_join(col("toks"), " ")))
      .cache()
    time("canonicalize (docs)") { docs.count() }
    val members = docs.select(col("fp"), col("doc_id"))
    val reps = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("rep_id"))
      .join(docs.select(col("doc_id").as("rep_id"), col("toks")), "rep_id")
      .cache()
    time("reps") { println(s"  reps=${reps.count()}") }
    val minExprs = (0 until nHashes).map(i =>
      min(xxhash64(lit(i), col("t"))).as(s"h$i"))
    val sig = reps.select(col("fp"), explode(col("toks")).as("t"))
      .groupBy(col("fp"))
      .agg(minExprs.head, (minExprs.tail :+ count(lit(1)).as("n_toks")): _*)
      .cache()
    time("signatures") { sig.count() }
    val banded = sig.select(
      col("fp"), col("n_toks"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
          col(s"h${b * rowsPerBand + r}"))): _*)): _*)).as(Seq("band", "bucket")))
      .cache()
    time("banding") { banded.count() }
    time("bucket sizes") {
      banded.groupBy(col("band"), col("bucket")).count()
        .orderBy(col("count").desc).show(10, false)
    }
    val l = banded.select(col("band"), col("bucket"), col("fp").as("fp_a"),
      col("n_toks").as("n_a"))
    val r = banded.select(col("band"), col("bucket"), col("fp").as("fp_b"),
      col("n_toks").as("n_b"))
    // production length-ratio prune: jaccard <= min/max set size
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("fp_a") < col("fp_b")
        && least(col("n_a"), col("n_b")) >= greatest(col("n_a"), col("n_b")) * (0.9 - 1e-4))
      .select(col("fp_a"), col("fp_b"))
      .distinct()
      .cache()
    time("candidates") { println(s"  cand=${candidates.count()}") }
    val ta = reps.select(col("fp").as("fp_a"), col("toks").as("toks_a"))
    val tb = reps.select(col("fp").as("fp_b"), col("toks").as("toks_b"))
    val inter = expr("sorted_intersect_size(toks_a, toks_b)")
    val repPairs = candidates.join(ta, "fp_a").join(tb, "fp_b")
      .withColumn("jaccard",
        round(inter * 1.0 / (size(col("toks_a")) + size(col("toks_b")) - inter), 4))
      .where(col("jaccard") >= 0.9)
      .select(col("fp_a"), col("fp_b"), col("jaccard"))
      .cache()
    time("verify (exact jaccard)") { println(s"  repPairs=${repPairs.count()}") }
    val ma = members.select(col("fp"), col("doc_id").as("doc_a"))
    val mb = members.select(col("fp"), col("doc_id").as("doc_b"))
    val intra = ma.join(mb, "fp").where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
    val cross = repPairs
      .join(members.select(col("fp").as("fp_a"), col("doc_id").as("id_a")), "fp_a")
      .join(members.select(col("fp").as("fp_b"), col("doc_id").as("id_b")), "fp_b")
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("jaccard"))
    val out = intra.unionByName(cross).orderBy(col("doc_a"), col("doc_b"))
    time("expand + sort (output)") { println(s"  out=${out.count()}") }
    spark.stop()
  }
}
