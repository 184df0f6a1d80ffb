package graft

/** SURVEY §5.3.6 strengthened: results must be invariant to the physical
  * partitioning knobs — the property that makes sf0.01 correctness
  * transfer to a 1000-executor cluster. Each sampled query runs in a
  * sibling session with spark.sql.shuffle.partitions=7 (vs the base 4)
  * and must produce byte-identical output.
  */
class PerturbationSpec extends SparkSpecBase {

  // order-sensitive and shuffle-heavy representatives from every category
  private val sample = Seq(
    "agg_pricing_summary", "agg_rollup", "agg_min_max_by", "agg_percentile_exact",
    "join_star_multiway", "join_asof_event_order", "join_full_outer",
    "win_topk_per_group", "win_ntile", "win_running_sum",
    "sort_multi_limit", "set_union_distinct", "subq_scalar_uncorr",
    "etl_dedup_latest", "etl_pivot", "stream_session_gaps",
    "stream_session_window", "text_tokenize_wordcount", "text_fingerprint",
    "vec_cosine_knn", "vec_pairwise_topk", "dedup_embedding_cosine",
    "mm_binary_stats", "udaf_typed_aggregator")

  private lazy val perturbed = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }

  for (key <- sample) {
    test(s"partition-invariant: $key") {
      val base = rowsOf(Catalog.byKey(key).run(spark, sfDir))
      val alt = rowsOf(Catalog.byKey(key).run(perturbed, sfDir))
      assert(base == alt, s"$key differs under shuffle.partitions=7")
    }
  }
}
