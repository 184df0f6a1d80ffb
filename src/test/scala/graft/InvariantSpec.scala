package graft

import org.apache.spark.sql.functions._

/** Semantic invariants the oracle compare CANNOT see.
  *
  * The driver's DuckDB hash-compare proves the Spark implementation and the
  * oracle SQL agree — but where both sides share a manufactured formula, a
  * formula bug passes the compare on both sides at once (the round-8
  * `etl_shard_export` ascii-mod-16 advisory was exactly this class: 10
  * skewed shards, 6 always empty, oracle green). These tests pin the
  * CLAIMED semantics of the formula-shared entries independently of the
  * oracle: range bounds, conservation laws, structural contiguity.
  */
class InvariantSpec extends SparkSpecBase {

  // NO .cache() here: the SparkSession is shared across suites, and a
  // leftover InMemoryRelation changes later suites' plans (PlanShapeSpec's
  // exchange counts); the sweep in afterAll is belt-and-braces for the
  // entries that cache internally.
  private def run(key: String) = Catalog.byKey(key).run(spark, sfDir)

  override def afterAll(): Unit = {
    graft.queries.Util.sweepEntryCaches(spark)
    super.afterAll()
  }

  test("win_ewma_frame stays inside each user's value envelope; first row equals its value") {
    val out = run("win_ewma_frame")
    val src = Tables.events(spark, sfDir).where(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val viol = out.join(src, "user_id")
      .where(col("ewma") < col("lo") - 0.0001 || col("ewma") > col("hi") + 0.0001)
      .count()
    assert(viol == 0, s"$viol EWMA values escaped the per-user min/max envelope")
    // each user's first event (1-row frame) must have ewma == value (round-4)
    val first = Tables.events(spark, sfDir).where(col("event_type") === "view")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), round(col("value"), 4).as("v0"))
    val firstViol = out.join(first, Seq("user_id", "event_id"))
      .where(abs(col("ewma") - col("v0")) > 0.0001).count()
    assert(firstViol == 0, s"$firstViol first-row EWMA values differ from the raw value")
  }

  test("agg_gini_coefficient lands in [0, 1)") {
    val g = run("agg_gini_coefficient").collect()(0).getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0, s"gini $g outside [0,1)")
  }

  test("etl_pack_sequences conserves tokens and never splits a document") {
    val out = run("etl_pack_sequences")
    val total = out.agg(sum(col("tokens"))).collect()(0).getLong(0)
    val src = Tables.documents(spark, sfDir)
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(total == src, s"packed tokens $total != corpus tokens $src")
    // a bin overflows by at most one document: tokens < budget + per-source max doc
    val maxDoc = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(max(size(split(col("text"), " "))).as("mx"))
    val over = out.join(maxDoc, "source")
      .where(col("tokens") >= lit(512) + col("mx")).count()
    assert(over == 0, s"$over bins exceed budget + one document")
  }

  test("text_chunk_windows chunk ids are dense from 0 and sizes are in [8, 32]") {
    val out = run("text_chunk_windows")
    val badSize = out.where(col("n_tokens") < 8 || col("n_tokens") > 32).count()
    assert(badSize == 0, s"$badSize chunks outside [8, 32] tokens")
    // the >=8 filter can only drop the LAST (tail) chunk, so surviving
    // chunk_idx per doc must be exactly 0..max
    val dense = out.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("chunk_idx")).as("mx"))
      .where(col("mx") =!= col("n") - 1).count()
    assert(dense == 0, s"$dense docs have non-contiguous chunk ids")
  }

  test("date_fiscal_calendar parts stay in range and fy differs from year by at most 1") {
    val out = run("date_fiscal_calendar")
    val bad = out.where(
      col("fq") < 1 || col("fq") > 4 ||
      col("f_doy") < 1 || col("f_doy") > 366 ||
      abs(col("fy") - year(col("dt"))) > 1).count()
    assert(bad == 0, s"$bad fiscal rows out of range")
    // July 1 must open fiscal Q1 day 1
    val julyFirst = out.where(month(col("dt")) === 7 && dayofmonth(col("dt")) === 1)
      .where(col("fq") =!= 1 || col("f_doy") =!= 1).count()
    assert(julyFirst == 0, "July 1 rows must be fiscal Q1 day 1")
  }

  test("dedup_chunk_exact fractions are consistent with counts") {
    val out = run("dedup_chunk_exact")
    val bad = out.where(col("n_dup") > col("n_chunks") ||
      col("dup_frac") < 0 || col("dup_frac") > 1).count()
    assert(bad == 0, s"$bad docs with inconsistent dup counts")
  }

  test("etl_sessionize_batch numbers sessions densely from 1 per user") {
    val out = run("etl_sessionize_batch")
    val dense = out.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("session_id")).as("lo"),
        max(col("session_id")).as("hi"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(dense == 0, s"$dense users with non-dense session numbering")
    val sizes = out.where(col("n_events") < 1 || col("dur_us") < 0).count()
    assert(sizes == 0, "sessions must have >=1 event and non-negative duration")
  }

  test("etl_scd2_apply keeps exactly one current row per key and splices intervals") {
    val out = run("etl_scd2_apply")
    val current = out.where(col("is_current") === 1)
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      .where(col("n") =!= 1).count()
    assert(current == 0, "every key must have exactly one current row")
    // for two-row keys, the closed row's valid_to must equal the new row's valid_from
    val spliced = out.groupBy(col("c_custkey")).agg(
      count(lit(1)).as("n"),
      max(when(col("is_current") === 0, col("valid_to"))).as("closed_to"),
      max(when(col("is_current") === 1, col("valid_from"))).as("open_from"))
      .where(col("n") === 2 && col("closed_to") =!= col("open_from")).count()
    assert(spliced == 0, "closed and new versions must splice at the effective date")
  }

  test("str_parse_number round-trips the original balance exactly") {
    val out = run("str_parse_number")
    val orig = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal"))
    val viol = out.join(orig, "c_custkey")
      .where(col("parsed") =!= col("bal")).count()
    assert(viol == 0, s"$viol parsed money strings differ from the source balance")
  }

  test("mm_binary_dedup conserves the asset count") {
    val out = run("mm_binary_dedup")
    val assets = out.agg(sum(col("n_copies") * col("n_payloads"))).collect()(0).getLong(0)
    val docs = Tables.documents(spark, sfDir).count()
    assert(assets == docs, s"copy distribution covers $assets assets, expected $docs")
  }

  test("agg_histogram_equidepth buckets are contiguous, ordered, and near-equal mass") {
    val out = run("agg_histogram_equidepth")
    // bounds must be non-decreasing across consecutive buckets
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("st")).orderBy(col("bkt"))
    val disorder = out.withColumn("prev_hi", lag(col("hi"), 1).over(w))
      .where(col("prev_hi").isNotNull && col("lo") < col("prev_hi")).count()
    assert(disorder == 0, "bucket bounds must be non-decreasing")
    // NTILE mass balance: counts within a group differ by at most 1
    val skew = out.groupBy(col("st"))
      .agg((max(col("n")) - min(col("n"))).as("d"))
      .where(col("d") > 1).count()
    assert(skew == 0, "equi-depth buckets must differ by at most one row")
  }

  test("etl_shard_export populates all 16 shards (the round-8 advisory regression pin)") {
    val out = run("etl_shard_export")
    val shards = out.select(col("shard")).distinct().count()
    assert(shards == 16, s"expected 16 populated shards, got $shards")
  }

  test("text_span_dedup conserves spans: kept count equals distinct spans in the corpus") {
    // both engines share the span-manufacture formula, so the oracle compare
    // can't catch a slicing bug — this pins keep-first semantics against an
    // independent spelling of "distinct 13-token spans"
    val out = run("text_span_dedup")
    val kept = out.agg(sum(col("n_kept"))).head().getLong(0)
    val spans = out.agg(sum(col("n_spans"))).head().getLong(0)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .select(explode(sequence(lit(0), ceil(col("n") / 13.0).cast("int") - 1)).as("si"),
        col("toks"), col("n"))
      .select(array_join(slice(col("toks"), col("si") * 13 + 1,
        least(lit(13), col("n") - col("si") * 13)), " ").as("span"))
    val distinctSpans = docs.select(col("span")).distinct().count()
    val totalSpans = docs.count()
    assert(spans == totalSpans, s"span universe drifted: $spans vs $totalSpans")
    assert(kept == distinctSpans,
      s"keep-first must retain each distinct span exactly once: kept=$kept distinct=$distinctSpans")
  }

  test("etl_k_anonymize: no surviving cell below k and totals conserved") {
    val out = run("etl_k_anonymize")
    val total = out.agg(sum(col("n_rows"))).head().getLong(0)
    val nCust = Tables.customer(spark, sfDir).count()
    assert(total == nCust, s"anonymization must conserve rows: $total vs $nCust")
    val survivors = out.filter(col("region_q") =!= -1)
    val below = survivors.filter(col("min_src_grp") < 8).count()
    assert(below == 0, "no non-suppressed QID cell may have fewer than k members")
  }

  test("agg_seasonal_anomaly: z-scores center near zero within each weekday") {
    val out = run("agg_seasonal_anomaly")
    val byDow = out.groupBy(col("dow")).agg(avg(col("z")).as("mz")).collect()
    byDow.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 0.01,
        s"weekday ${r.getLong(0)} z-mean ${r.getDouble(1)} not centered")
    }
  }
}
