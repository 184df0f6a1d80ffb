package graft

/** Ad-hoc A/B harness: mean IVF-PQ recall@10 over many query ids, raw codes
  * vs residual-encoded codes. Run: sbt "Test/runMain graft.RecallAB [sfDir]".
  * Kept in test scope — it is measurement tooling, not library surface.
  */
object RecallAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.spark
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val qids = Seq(0L, 17L, 59L, 101L, 167L, 234L, 301L, 334L, 408L, 455L)
    val brute = qids.map { q =>
      q -> graft.queries.VectorQueries.bruteTopK(spark, sfDir, q)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }.toMap
    Seq(false, true).foreach { res =>
      val recalls = qids.map { q =>
        val got = graft.queries.VectorQueries.ivfPqTopK(spark, sfDir, q, res)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (got & brute(q)).size.toDouble / brute(q).size
      }
      println(f"[recall-ab] residual=$res%-5s mean=${recalls.sum / recalls.size}%.3f " +
        recalls.map(r => f"$r%.1f").mkString(" "))
    }
    spark.stop()
  }
}
