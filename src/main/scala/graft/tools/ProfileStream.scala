package graft.tools

import org.apache.spark.sql.SparkSession

/** Where do the tier-E streaming seconds go? Runs one streaming catalog
  * entry (arg 0, default stream_stream_join) and prints every micro-batch's
  * durationMs breakdown (addBatch / walCommit / stateStore commit …) from
  * the progress events — local profiling aid, not part of the engine.
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("stream_stream_join")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[stream] started ${e.id}")
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"[stream] batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          s"durations=${e.progress.durationMs}")
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[stream] terminated")
    })
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(key)(spark, sfDir).count()
      println(f"[stream] run$i $key rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
