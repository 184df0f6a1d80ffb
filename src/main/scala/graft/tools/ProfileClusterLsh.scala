package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage-by-stage timing of the dedup_cluster_lsh pipeline (r14 — the
  * catalog's top entry after the floor work). Mirrors the production
  * spelling at conf defaults (contraction off, adj uncached); each stage
  * is materialized with a count so the printed number isolates that
  * stage's cost on top of its cached inputs. Dev tool, not catalog.
  */
object ProfileClusterLsh {
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
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[clsh] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val bands = 16; val rowsPerBand = 2; val nHashes = bands * rowsPerBand
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sort_array(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("fp", md5(array_join(col("toks"), " ")))
      .cache()
    time("canonicalize") { t.count() }
    val members = t.select(col("fp"), col("doc_id"), col("lang"), col("n_chars"))
    val reps = t.groupBy(col("fp")).agg(min(col("doc_id")).as("rep_id"))
      .join(t.select(col("doc_id").as("rep_id"), col("toks")), "rep_id")
    val minExprs = (0 until nHashes).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sig = reps.select(col("fp"), explode(col("toks")).as("s"))
      .groupBy(col("fp")).agg(minExprs.head, minExprs.tail: _*)
      .cache()
    time("signatures") { sig.count() }
    val banded = members.join(sig, "fp").select(
      col("fp"), col("doc_id"), col("lang"), col("n_chars"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
          col(s"h${b * rowsPerBand + r}"))): _*)): _*)).as(Seq("band", "bucket")))
      .cache()
    time("banding (member fanout)") { println(s"  banded=${banded.count()}") }
    val ncBin = floor((col("n_chars") + pmod(col("band"), lit(2)) * 10) / 20)
    val chainW = Window.partitionBy(col("band"), col("bucket"), col("lang"))
      .orderBy(ncBin, xxhash64(col("band"), col("doc_id")), col("doc_id"))
    val adj = banded.select(col("doc_id"), col("fp"), col("n_chars"),
      lead(col("doc_id"), 1).over(chainW).as("n1id"),
      lead(col("fp"), 1).over(chainW).as("n1fp"),
      lead(col("n_chars"), 1).over(chainW).as("n1nc"),
      lead(col("doc_id"), 2).over(chainW).as("n2id"),
      lead(col("fp"), 2).over(chainW).as("n2fp"),
      lead(col("n_chars"), 2).over(chainW).as("n2nc"))
    val cand = adj
      .select(col("doc_id"), col("fp"), col("n_chars"), explode(array(
        struct(col("n1id").as("nid"), col("n1fp").as("nfp"), col("n1nc").as("nnc")),
        struct(col("n2id").as("nid"), col("n2fp").as("nfp"), col("n2nc").as("nnc")))).as("nx"))
      .where(col("nx.nid").isNotNull
        && col("nx.nnc").between(col("n_chars") - 20, col("n_chars") + 20))
      .select(least(col("doc_id"), col("nx.nid")).as("src"),
        greatest(col("doc_id"), col("nx.nid")).as("dst"),
        col("fp").as("fp_a"), col("nx.nfp").as("fp_b"))
      .distinct()
      .cache()
    time("chain window + distinct") { println(s"  cand=${cand.count()}") }
    time("distinct fp pairs") {
      println(s"  fpCand=${cand.select(least(col("fp_a"), col("fp_b")),
        greatest(col("fp_a"), col("fp_b"))).distinct().count()}" +
        s" (identical-fp doc pairs: ${cand.where(col("fp_a") === col("fp_b")).count()})")
    }
    val ga = reps.select(col("fp").as("fp_a"), col("toks").as("toks_a"))
    val gb = reps.select(col("fp").as("fp_b"), col("toks").as("toks_b"))
    val inter = expr("sorted_intersect_size(toks_a, toks_b)")
    val chainEdges = cand.join(ga, "fp_a").join(gb, "fp_b")
      .where(round(inter * 1.0 /
        (size(col("toks_a")) + size(col("toks_b")) - inter), 4) >= 0.5)
      .select(col("src"), col("dst"))
      .cache()
    time("exact-Jaccard verify") { println(s"  edges=${chainEdges.count()}") }
    val ma = members.select(col("fp"), col("doc_id").as("src"),
      col("lang").as("lang_a"), col("n_chars").as("nc_a"))
    val mb = members.select(col("fp"), col("doc_id").as("dst"),
      col("lang").as("lang_b"), col("n_chars").as("nc_b"))
    val intra = ma.join(mb, "fp")
      .where(col("src") < col("dst") && col("lang_a") === col("lang_b")
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20))
      .select(col("src"), col("dst"))
      .cache()
    time("intra clone pairs") { println(s"  intra=${intra.count()}") }
    val full = time("full entry (fresh)") {
      graft.SparkEntry.queries("dedup_cluster_lsh")(spark, sfDir).count()
    }
    println(s"  entry rows=$full")
    spark.stop()
  }
}
