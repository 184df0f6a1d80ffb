package graft

import org.apache.spark.sql.functions._

/** SURVEY §5.3.5 — streaming/batch equivalence: the Structured Streaming
  * paths under Trigger.AvailableNow must equal their batch twins. */
class StreamSpec extends SparkSpecBase {

  test("stateful sessions run identically on the RocksDB state store (SURVEY §8.1.6)") {
    // production posture at real state cardinalities: the HDFS-backed
    // in-memory provider holds every key on-heap, RocksDB spills state to
    // local disk. The provider must be a pure swap — same results, no code
    // change — which is exactly what this asserts by re-running the
    // flatMapGroupsWithState entry on a sibling session with the provider
    // flipped and diffing against the default-provider output.
    val default = rowsOf(Catalog.byKey("stream_stateful_sessions").run(spark, sfDir))
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks = rowsOf(Catalog.byKey("stream_stateful_sessions").run(s, sfDir))
    assert(rocks == default, "RocksDB state store changed the sessionizer output")
  }

  test("stream_dedup_watermark equals batch dropDuplicates") {
    val streamed = Catalog.byKey("stream_dedup_watermark").run(spark, sfDir)
      .select("event_id").orderBy("event_id")
    val batch = Tables.events(spark, sfDir)
      .dropDuplicates("event_id")
      .select("event_id").orderBy("event_id")
    assert(rowsOf(streamed) == rowsOf(batch))
  }

  test("stream_late_data final windows match batch for closed windows") {
    // with AvailableNow over a static source, append mode emits exactly the
    // windows the final watermark passed; every emitted window must agree
    // with the batch aggregation
    val streamed = Catalog.byKey("stream_late_data").run(spark, sfDir)
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (w, n) =>
      assert(batch.get(w).contains(n), s"window $w: streamed=$n batch=${batch.get(w)}")
    }
  }

  test("stream_foreachbatch_upsert target equals whole-input profile") {
    val merged = Catalog.byKey("stream_foreachbatch_upsert").run(spark, sfDir)
      .select("user_id", "n_events", "last_seen").orderBy("user_id")
    // AvailableNow may process in one or more micro-batches; the additive
    // merge must converge to the global per-user profile either way
    val batch = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_seen"))
      .orderBy("user_id")
    assert(rowsOf(merged) == rowsOf(batch))
  }

  test("flatMapGroupsWithState sessionizer equals SQL gaps-and-islands") {
    val stateful = Catalog.byKey("stream_stateful_sessions").run(spark, sfDir)
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
    val sql = Catalog.byKey("stream_session_gaps").run(spark, sfDir)
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
    assert(rowsOf(stateful) == rowsOf(sql))
  }

  test("native session_window agrees with gaps-and-islands on start/count") {
    val native = Catalog.byKey("stream_session_window").run(spark, sfDir)
      .select("user_id", "win_start", "n_events").orderBy("user_id", "win_start")
    val manual = Catalog.byKey("stream_session_gaps").run(spark, sfDir)
      .select(col("user_id"), col("session_start").as("win_start"), col("n_events"))
      .orderBy("user_id", "win_start")
    assert(rowsOf(native) == rowsOf(manual))
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = Catalog.byKey("stream_stream_join").run(spark, sfDir)
      .select("err_id", "purch_id").orderBy("err_id", "purch_id")
    val ev = Tables.events(spark, sfDir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"), col("ts").as("err_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id").as("purch_user"), col("ts").as("purch_ts"))
    val batch = errors.join(purchases,
        col("err_user") === col("purch_user")
          && col("purch_ts") >= col("err_ts") - expr("INTERVAL 1 HOUR")
          && col("purch_ts") <= col("err_ts"))
      .select("err_id", "purch_id").orderBy("err_id", "purch_id")
    assert(rowsOf(streamed) == rowsOf(batch))
  }

  test("stream_tumbling_agg batch twin equals a streaming run of same logic") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_streamspec_src"
    val ckpt = s"${sys.props("java.io.tmpdir")}/graft_streamspec_ckpt"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(tmp)
    val schema = StructType(Seq(
      // ts is TIMESTAMP_NTZ end-to-end since round 2 (Tables.load)
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val q = spark.readStream.schema(schema).parquet(tmp)
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("n"))
      .writeStream.format("memory").queryName("tumbling_twin")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("tumbling_twin").orderBy("win_start")
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    val batch = Catalog.byKey("stream_tumbling_agg").run(spark, sfDir)
      .select("win_start", "n")
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    assert(streamed == batch)
  }

  test("transformWithState census equals the batch aggregate") {
    // the entry's multi-batch MapState carry, reduced to last-snapshot per
    // user, must equal a plain batch groupBy — whatever the file batching
    val streamed = Catalog.byKey("stream_transform_state").run(spark, sfDir)
      .orderBy("user_id")
    val perType = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("c").desc, col("event_type").asc)
    val batch = perType
      .withColumn("rk", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("total"),
        count(lit(1)).as("n_types"),
        max(when(col("rk") === 1, col("event_type"))).as("top_type"))
      .orderBy("user_id")
      .select("user_id", "total", "n_types", "top_type")
    assert(rowsOf(streamed) == rowsOf(batch))
  }
}
