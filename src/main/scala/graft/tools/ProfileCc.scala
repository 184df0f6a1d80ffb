package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage timing for dedup_cluster_cc: edge discovery vs label
  * propagation — local profiling aid, not part of the catalog. */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TextFunctions.ensureRegistered(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sort_array(array_distinct(split(col("text"), " "))).as("toks"),
        floor(col("n_chars") / 20).as("bucket"))
    val a = t.select(col("doc_id").as("src"), col("lang"),
      col("n_chars").as("nc_a"), col("toks").as("toks_a"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = t.select(col("doc_id").as("dst"), col("lang"),
      col("n_chars").as("nc_b"), col("toks").as("toks_b"), col("bucket"))
    val inter = expr("sorted_intersect_size(toks_a, toks_b)")
    val edges = a.join(b, Seq("lang", "bucket"))
      .where(col("src") < col("dst")
        && col("nc_b").between(col("nc_a") - 20, col("nc_a") + 20)
        && least(size(col("toks_a")), size(col("toks_b")))
           >= greatest(size(col("toks_a")), size(col("toks_b"))) * (0.5 - 1e-4))
      .where(round(inter * 1.0 / (size(col("toks_a")) + size(col("toks_b")) - inter), 4)
        >= 0.5)
      .select(col("src"), col("dst"))
    val bi = time("discovery+bi") {
      val f = edges
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      println(s"  edges(bi)=${f.count()}")
      f
    }
    var biVar = bi
    var labels = bi.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    println(s"  nodes=${labels.count()}")
    // mirrors the production loop: 3×(propagate+compress) per
    // materialization, monotone sum(comp) convergence, edge contraction
    def iterate(cur: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val viaEdge = biVar.join(cur, biVar("src") === cur("node"))
        .select(biVar("dst").as("node"), col("comp"))
      val prop = cur.unionByName(viaEdge)
        .groupBy("node").agg(min("comp").as("comp"))
      val parent = prop.select(col("node").as("p_node"), col("comp").as("p_comp"))
      prop.join(parent, col("comp") === col("p_node"))
        .select(col("node"), col("p_comp").as("comp"))
    }
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 25) {
      time(s"round $rounds") {
        val next = iterate(iterate(iterate(labels))).localCheckpoint()
        val s = labelSum(next)
        converged = s == prevSum
        prevSum = s
        labels = next
        rounds += 1
        if (!converged) {
          val lsrc = labels.select(col("node").as("src"), col("comp").as("csrc"))
          val ldst = labels.select(col("node").as("dst"), col("comp").as("cdst"))
          biVar = biVar.join(lsrc, "src").join(ldst, "dst")
            .where(col("csrc") =!= col("cdst"))
            .select(col("csrc").as("src"), col("cdst").as("dst"))
            .distinct()
            .localCheckpoint()
          val remaining = biVar.count()
          println(s"  contracted edges=$remaining")
          converged = remaining == 0L
        }
      }
    }
    println(s"  rounds=$rounds comps=${labels.select(col("comp")).distinct().count()}")
    spark.stop()
  }
}
