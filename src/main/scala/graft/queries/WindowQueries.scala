package graft.queries

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Category E — window functions (SURVEY.md §2.1.E).
  *
  * Every window partitions by a real key (user/customer/nation) so the
  * single shuffle it costs is hash-distributed across executors; no window
  * here is ORDER BY over the whole table except `win_range_frame`,
  * `win_ntile`, and `win_cume_dist`, whose global order is the operator's
  * semantics. Those three stand as contract exemplars at test scale; their
  * 100-TB rewrite is the bucketed composite-rank pattern — per-value-bucket
  * local ranks + broadcast prefix offsets, bit-identical output — that
  * `agg_gini_coefficient` implements and PLANS.md §"Global windows at
  * 100 TB" spells out per entry. Rank ties are always broken by a unique
  * key (§2.0.1).
  */
object WindowQueries {

  private def byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  private val rowNumber = CatalogEntry.ansi(
    "win_row_number",
    """SELECT event_id, user_id,
      |       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        row_number().over(byUser).cast("long").as("rn"))
      .orderBy(col("event_id"))
  }

  /** rank vs dense_rank under real ties (acctbal duplicates exist). Tie rows
    * get equal ranks in both engines, so no tie-break is needed inside the
    * window — only in the output order. */
  private val rankDense = CatalogEntry.ansi(
    "win_rank_dense",
    """SELECT c_custkey, c_nationkey,
      |       RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rk,
      |       DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drk
      |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"),
        rank().over(w).cast("long").as("rk"), dense_rank().over(w).cast("long").as("drk"))
      .orderBy(col("c_custkey"))
  }

  /** Gap/delta analysis — previous & next value with defaults. Values pass
    * through un-arithmetic'd, so raw doubles compare exactly. */
  private val lagLead = CatalogEntry.ansi(
    "win_lag_lead",
    """SELECT event_id, user_id, value,
      |       LAG(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_val,
      |       LEAD(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_val
      |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1, 0.0).over(byUser).as("prev_val"),
        lead(col("value"), 1, 0.0).over(byUser).as("next_val"))
      .orderBy(col("event_id"))
  }

  /** Cumulative revenue per customer — decimal running sum, exact. */
  private val runningSum = CatalogEntry.ansi(
    "win_running_sum",
    """SELECT o_orderkey, o_custkey,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        decOut(sum(dec(col("o_totalprice"))).over(w)).as("running_total"))
      .orderBy(col("o_orderkey"))
  }

  /** 3-row moving average. Both engines sum the ≤3 frame rows left-to-right
    * in the frame order; ROUND(…,4) absorbs last-ulp drift. */
  private val movingAvg = CatalogEntry.ansi(
    "win_moving_avg",
    """SELECT event_id, user_id,
      |       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
      |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w = byUser.rowsBetween(-2, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        round(avg(col("value")).over(w), 4).as("ma3"))
      .orderBy(col("event_id"))
  }

  /** RANGE frame — peers-inclusive running count by price (ties counted
    * together, identically in both engines). */
  private val rangeFrame = CatalogEntry.ansi(
    "win_range_frame",
    """SELECT o_orderkey,
      |       COUNT(*) OVER (ORDER BY o_totalprice
      |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_or_below
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    val w = Window.orderBy(col("o_totalprice"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), count(lit(1)).over(w).as("n_at_or_below"))
      .orderBy(col("o_orderkey"))
  }

  /** Quartiles — NTILE needs a total order, so the tie-break on custkey is
    * load-bearing for determinism. */
  private val ntileQuartiles = CatalogEntry.ansi(
    "win_ntile",
    """SELECT c_custkey,
      |       NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        ntile(4).over(Window.orderBy(col("c_acctbal"), col("c_custkey"))).cast("long").as("quartile"))
      .orderBy(col("c_custkey"))
  }

  /** first/last over the full partition — frame must be explicit (default
    * frame stops at CURRENT ROW and would make last_value = self). */
  private val firstLast = CatalogEntry.dialect(
    "win_first_last",
    duckdb = """SELECT event_id, user_id,
               |       first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
               |       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id, user_id,
              |       first(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
              |       last(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
      .orderBy(col("event_id"))
  }

  /** Top-k per group — the canonical dedup/top pattern: row_number over a
    * desc window, filter rn ≤ k. At 100 TB this is one hash shuffle on the
    * group key + per-partition sort; never a global sort. */
  private val topkPerGroup = CatalogEntry.ansi(
    "win_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice AS price, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("price"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Distribution functions + ratio-to-report (the Redshift
    * RATIO_TO_REPORT analog): each value's share of its partition. The
    * tie-broken total order makes the rational ranks identical across
    * engines; the ratio's double division rounds at 4. */
  private val distributionFns = CatalogEntry.ansi(
    "win_percent_rank",
    """SELECT c_custkey,
      |       ROUND(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 4) AS pr,
      |       ROUND(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 4) AS cd,
      |       ROUND(c_acctbal / SUM(c_acctbal) OVER (PARTITION BY c_nationkey), 4) AS share
      |FROM customer
      |WHERE c_acctbal > 0
      |ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    val ord = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val byNation = Window.partitionBy(col("c_nationkey"))
    Tables.customer(spark, sfDir)
      .where(col("c_acctbal") > 0)
      .select(col("c_custkey"),
        round(percent_rank().over(ord), 4).as("pr"),
        round(cume_dist().over(ord), 4).as("cd"),
        round(col("c_acctbal") / sum(col("c_acctbal")).over(byNation), 4).as("share"))
      .orderBy(col("c_custkey"))
  }

  /** nth_value over the full partition frame (needs the explicit frame
    * like first/last — the default frame would truncate at CURRENT ROW). */
  private val nthValue = CatalogEntry.ansi(
    "win_nth_value",
    """SELECT event_id, user_id,
      |       nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type
      |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .orderBy(col("event_id"))
  }

  /** Running DISTINCT count over a growing frame — Spark rejects DISTINCT
    * aggregates inside windows, so the engine composes
    * `size(collect_set(...))` over an explicit ROWS frame; the oracle uses
    * DuckDB's native windowed COUNT(DISTINCT). The ROWS frame is explicit
    * on BOTH sides: the default RANGE frame includes order-by peers, and
    * only the unique (ts, event_id) order makes the two frames coincide.
    * Scale note: the set state is bounded by the distinct-value cardinality
    * (event types here — single digits), not the frame length; a
    * high-cardinality column would need a sketch (`agg_hll_sketch_merge`)
    * instead of an exact set. */
  private val distinctFrame = CatalogEntry.dialect(
    "win_distinct_frame",
    duckdb = """SELECT event_id, user_id,
               |       COUNT(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id, user_id,
              |       CAST(size(collect_set(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS n_types
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        size(collect_set(col("event_type")).over(w)).cast("long").as("n_types"))
      .orderBy(col("event_id"))
  }

  /** Moving 7-row median — an ORDER-STATISTIC over a sliding frame, which
    * Spark's windowed aggregates don't offer (percentile_approx is not
    * window-able): the engine collects the frame, sorts it, and picks the
    * middle (averaging the two middles on even frames — the same
    * interpolation DuckDB's windowed median applies, so the two engines
    * run identical arithmetic). The frame holds ≤7 values by construction:
    * the sort is per-row-constant work, not a scalability term. */
  private val movingMedian = CatalogEntry.dialect(
    "win_moving_median",
    duckdb = """SELECT event_id, user_id,
               |       ROUND(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id, user_id,
              |       ROUND(CASE WHEN size(xs) % 2 = 1 THEN element_at(array_sort(xs), CAST((size(xs) + 1) DIV 2 AS INT))
              |                  ELSE (element_at(array_sort(xs), CAST(size(xs) DIV 2 AS INT))
              |                        + element_at(array_sort(xs), CAST(size(xs) DIV 2 + 1 AS INT))) / 2.0 END, 4) AS med
              |FROM (
              |  SELECT event_id, user_id,
              |         collect_list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS xs
              |  FROM events
              |) ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    val xs = sort_array(collect_list(col("value")).over(w))
    val n = size(xs)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), xs.as("xs"), n.as("n"))
      .select(col("event_id"), col("user_id"),
        round(when(col("n") % 2 === 1, element_at(col("xs"), ((col("n") + 1) / 2).cast("int")))
          .otherwise((element_at(col("xs"), (col("n") / 2).cast("int"))
            + element_at(col("xs"), (col("n") / 2 + 1).cast("int"))) / 2.0), 4).as("med"))
      .orderBy(col("event_id"))
  }

  /** Time-interval RANGE frames — the event-time form of `win_range_frame`:
    * per user, the frame is every event whose ts lies within the trailing
    * interval of the current row's ts (peers included, so ties need no
    * tie-break — RANGE semantics make the frame deterministic by value).
    * Two widths: a 7-day frame that is well-populated at every sf (~2
    * events/user/day) and a 1-hour frame exercising sub-day intervals.
    * Money math follows §2.0.3: cast to DECIMAL before summing, DOUBLE out.
    * The partition key is user_id, so the one shuffle hash-distributes and
    * the per-partition sort is bounded by a user's history — the
    * 100-TB-safe shape (no global-order window). Expressed through the SQL
    * window spec: interval RANGE bounds are SQL-only surface in Spark (the
    * DataFrame rangeBetween API takes numeric offsets). */
  private val rangeInterval = CatalogEntry.dialect(
    "win_range_interval",
    duckdb = """SELECT event_id,
               |       COUNT(*) OVER w7 AS cnt_7d,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w7 AS DOUBLE) AS sum_7d,
               |       COUNT(*) OVER w1 AS cnt_1h,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w1 AS DOUBLE) AS sum_1h
               |FROM events
               |WINDOW
               |  w7 AS (PARTITION BY user_id ORDER BY ts
               |         RANGE BETWEEN INTERVAL '7 days' PRECEDING AND CURRENT ROW),
               |  w1 AS (PARTITION BY user_id ORDER BY ts
               |         RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
               |ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id,
              |       COUNT(*) OVER w7 AS cnt_7d,
              |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w7 AS DOUBLE) AS sum_7d,
              |       COUNT(*) OVER w1 AS cnt_1h,
              |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w1 AS DOUBLE) AS sum_1h
              |FROM events
              |WINDOW
              |  w7 AS (PARTITION BY user_id ORDER BY ts
              |         RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND CURRENT ROW),
              |  w1 AS (PARTITION BY user_id ORDER BY ts
              |         RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w7 = "(PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND CURRENT ROW)"
    val w1 = "(PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)"
    Tables.events(spark, sfDir)
      .withColumn("vd", col("value").cast("decimal(18,4)"))
      .select(
        col("event_id"),
        expr(s"COUNT(*) OVER $w7").as("cnt_7d"),
        expr(s"SUM(vd) OVER $w7").cast("double").as("sum_7d"),
        expr(s"COUNT(*) OVER $w1").as("cnt_1h"),
        expr(s"SUM(vd) OVER $w1").cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** IGNORE NULLS navigation battery — the Redshift forms of lag/first/
    * last that skip nulls (last known price, previous purchase…). The null
    * pattern is manufactured deterministically (value only on 'purchase'
    * rows). DuckDB 1.0 has no IGNORE NULLS syntax, so the oracle states
    * the same semantics as arg_max/arg_min window aggregates with a FILTER
    * over a rank column: "the latest non-null before/at this row" is
    * exactly arg_max(pv, rn) over the corresponding frame. The Spark side
    * uses the real ignoreNulls API — which is the operator under test. */
  private val ignoreNulls = CatalogEntry.dialect(
    "win_ignore_nulls",
    duckdb = """WITH base AS (
               |  SELECT event_id, user_id, ts,
               |         CASE WHEN event_type = 'purchase' THEN ROUND(value, 4) END AS pv,
               |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               |  FROM events
               |)
               |SELECT event_id,
               |  arg_max(pv, rn) FILTER (pv IS NOT NULL) OVER
               |    (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase,
               |  arg_min(pv, rn) FILTER (pv IS NOT NULL) OVER
               |    (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_purchase_so_far,
               |  arg_max(pv, rn) FILTER (pv IS NOT NULL) OVER
               |    (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_so_far
               |FROM base ORDER BY event_id""".stripMargin,
    spark = """WITH base AS (
              |  SELECT event_id, user_id, ts,
              |         CASE WHEN event_type = 'purchase' THEN ROUND(value, 4) END AS pv
              |  FROM events
              |)
              |SELECT event_id,
              |  lag(pv) IGNORE NULLS OVER w AS prev_purchase,
              |  first_value(pv) IGNORE NULLS OVER
              |    (PARTITION BY user_id ORDER BY ts, event_id
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_purchase_so_far,
              |  last_value(pv) IGNORE NULLS OVER
              |    (PARTITION BY user_id ORDER BY ts, event_id
              |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_so_far
              |FROM base
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              |ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("pv",
        when(col("event_type") === "purchase", round(col("value"), 4)))
      .select(
        col("event_id"),
        lag(col("pv"), 1, null, ignoreNulls = true).over(w).as("prev_purchase"),
        first(col("pv"), ignoreNulls = true).over(running).as("first_purchase_so_far"),
        last(col("pv"), ignoreNulls = true).over(running).as("last_purchase_so_far"))
      .orderBy(col("event_id"))
  }

  /** RATIO_TO_REPORT analog: each row's share of its partition total. The
    * operands are exact decimals on both sides (one shuffle for the
    * partition-total window), and the division is cast to DOUBLE before
    * rounding — DuckDB's decimal division yields DOUBLE natively, Spark's
    * would stay decimal (§2.0 dialect trap). */
  private val ratioToReport = CatalogEntry.dialect(
    "win_ratio_to_report",
    duckdb = """SELECT event_id,
               |       ROUND(CAST(value AS DECIMAL(18,4)) /
               |             SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id), 6) AS ratio
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id,
              |       ROUND(CAST(CAST(value AS DECIMAL(18,4)) /
              |             SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id) AS DOUBLE), 6) AS ratio
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .withColumn("vd", dec(col("value")))
      .select(col("event_id"),
        round((col("vd") / sum(col("vd")).over(w)).cast("double"), 6).as("ratio"))
      .orderBy(col("event_id"))
  }

  /** CUME_DIST — the peers-inclusive rank fraction (completes the
    * distribution-function family beside percent_rank/ntile). The value is
    * an exact small rational (peer count / partition count) computed by the
    * identical division on both engines, so round(…,6) is safely inside
    * the representable-double class. */
  private val cumeDist = CatalogEntry.ansi(
    "win_cume_dist",
    """SELECT o_orderkey,
      |       ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6) AS cd
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** Gaps-and-islands — runs of consecutive activity days per user (the
    * classic warehouse streak query: retention streaks, SLA uptime runs,
    * consecutive-login badges). The textbook move: distinct activity dates,
    * ROW_NUMBER per user over the date order, and `date - rn` collapses
    * each consecutive run to one constant group key — two hash shuffles on
    * user_id-rooted keys, no self-join, no iteration, which is what makes
    * the pattern safe at 100 TB (the naive LEFT JOIN date+1 formulation
    * shuffles twice as much and dies on skew). Purchase events only, so the
    * day grid is sparse enough that islands are real (6-14 distinct days
    * per user against a 31-day month). */
  private val gapsIslands = CatalogEntry.dialect(
    "win_gaps_islands",
    duckdb = """WITH d AS (
               |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
               |  FROM events WHERE event_type = 'purchase'
               |), r AS (
               |  SELECT user_id, dt,
               |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dt) AS rn
               |  FROM d
               |), isl AS (
               |  SELECT user_id, dt - CAST(rn AS INTEGER) AS grp,
               |         COUNT(*) AS len, MIN(dt) AS start_dt
               |  FROM r GROUP BY user_id, grp
               |)
               |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
               |       CAST(MAX(len) AS BIGINT) AS max_len,
               |       MIN(start_dt) AS first_start
               |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,
    spark = """WITH d AS (
              |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
              |  FROM events WHERE event_type = 'purchase'
              |), r AS (
              |  SELECT user_id, dt,
              |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dt) AS rn
              |  FROM d
              |), isl AS (
              |  SELECT user_id, DATE_SUB(dt, CAST(rn AS INT)) AS grp,
              |         COUNT(*) AS len, MIN(dt) AS start_dt
              |  FROM r GROUP BY user_id, grp
              |)
              |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
              |       CAST(MAX(len) AS BIGINT) AS max_len,
              |       MIN(start_dt) AS first_start
              |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("dt"))
    Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").cast("date").as("dt"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"), date_sub(col("dt"), col("rn")).as("grp"))
      .agg(count(lit(1)).as("len"), min(col("dt")).as("start_dt"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_islands"),
        max(col("len")).cast("long").as("max_len"),
        min(col("start_dt")).as("first_start"))
      .orderBy(col("user_id"))
  }

  /** Running peak and drawdown — the high-water-mark pair (finance's
    * drawdown, ops' record-to-date gap): cumulative revenue, its running
    * maximum, and the distance below it, per user over event time. Three
    * stacked window functions on ONE (user_id; ts, event_id) sort — the
    * running max composes over the running sum with no extra shuffle, and
    * the whole thing is a single pass per partition at any scale. Sums stay
    * DECIMAL(18,4) internally so cum/peak/drawdown are exact before the
    * DOUBLE output cast (§2.0.3); the event_id tie-break pins same-µs
    * purchases. */
  private val drawdown = CatalogEntry.ansi(
    "win_drawdown",
    """WITH p AS (
      |  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,4)) AS v
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, ts, event_id,
      |         SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM p
      |)
      |SELECT user_id, event_id,
      |       CAST(cum AS DOUBLE) AS cum_rev,
      |       CAST(MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS peak,
      |       CAST(MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) - cum AS DOUBLE) AS drawdown
      |FROM c ORDER BY user_id, event_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), dec(col("value")).as("v"))
      .withColumn("cum", sum(col("v")).over(w))
      .withColumn("peak", max(col("cum")).over(w))
      .select(col("user_id"), col("event_id"),
        decOut(col("cum")).as("cum_rev"),
        decOut(col("peak")).as("peak"),
        decOut(col("peak") - col("cum")).as("drawdown"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Exponentially-weighted moving average over a bounded 10-row frame —
    * the smoothing companion of `win_moving_avg` (recent rows dominate:
    * weight 0.2·0.8ⁱ on the i-th row back, renormalized over however much
    * history the frame holds, so early rows get a full-weight average, not
    * a damped one). True infinite-history EWMA is a sequential recurrence;
    * the bounded frame makes it a per-row pure function of 10 values —
    * embarrassingly parallel, and the dropped tail is < 0.8¹⁰ ≈ 10% of
    * weight. Same collect-frame-then-fold move as `win_moving_median`
    * (order statistics and weighted folds both need the frame as data);
    * the fold runs oldest-last via reverse, so weights attach by recency,
    * and both engines fold the same 10 doubles in the same order. */
  private val ewmaFrame = CatalogEntry.dialect(
    "win_ewma_frame",
    duckdb = """WITH p AS (
               |  SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v
               |  FROM events WHERE event_type = 'view'
               |), l AS (
               |  SELECT user_id, event_id,
               |         list_reverse(list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
               |                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) AS r
               |  FROM p
               |)
               |SELECT user_id, event_id,
               |  ROUND(list_sum(list_transform(range(1, len(r)+1), i -> r[i] * 0.2 * pow(0.8, i-1))) /
               |        list_sum(list_transform(range(1, len(r)+1), i -> 0.2 * pow(0.8, i-1))), 4) AS ewma
               |FROM l ORDER BY user_id, event_id""".stripMargin,
    spark = """WITH p AS (
              |  SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v
              |  FROM events WHERE event_type = 'view'
              |), l AS (
              |  SELECT user_id, event_id,
              |         reverse(collect_list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) AS r
              |  FROM p
              |)
              |SELECT user_id, event_id,
              |  ROUND(aggregate(transform(sequence(1, size(r)), i -> element_at(r, i) * 0.2D * pow(0.8D, i-1)), 0D, (a, x) -> a + x) /
              |        aggregate(transform(sequence(1, size(r)), i -> 0.2D * pow(0.8D, i-1)), 0D, (a, x) -> a + x), 4) AS ewma
              |FROM l ORDER BY user_id, event_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-9, Window.currentRow)
    Tables.events(spark, sfDir)
      .where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double").as("v"))
      .withColumn("r", reverse(collect_list(col("v")).over(w)))
      .select(col("user_id"), col("event_id"),
        round(
          expr("aggregate(transform(sequence(1, size(r)), i -> element_at(r, i) * 0.2D * pow(0.8D, i-1)), 0D, (a, x) -> a + x)") /
          expr("aggregate(transform(sequence(1, size(r)), i -> 0.2D * pow(0.8D, i-1)), 0D, (a, x) -> a + x)"),
          4).as("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Year-over-year growth — the period-over-period report (lag on a
    * yearly rollup + percent change), the single most common BI window
    * query. The unpartitioned ORDER BY yr window is safe BECAUSE it runs
    * on the rollup, not the facts: the heavy aggregation shuffles on year
    * first, and the window then sorts |years| rows — bounded by the
    * calendar at any corpus size (the anti-pattern would be windowing the
    * fact table itself). Revenue sums go through DECIMAL; the growth ratio
    * is double with round-4. */
  private val yoyGrowth = CatalogEntry.ansi(
    "win_yoy_growth",
    """WITH y AS (
      |  SELECT year(o_orderdate) AS yr,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY year(o_orderdate)
      |)
      |SELECT CAST(yr AS BIGINT) AS yr, rev,
      |       LAG(rev) OVER (ORDER BY yr) AS prev_rev,
      |       ROUND((rev - LAG(rev) OVER (ORDER BY yr)) * 100.0 / LAG(rev) OVER (ORDER BY yr), 4) AS yoy_pct
      |FROM y ORDER BY yr""".stripMargin) { (spark, sfDir) =>
    val w = Window.orderBy(col("yr"))
    Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(decOut(sum(dec(col("o_totalprice")))).as("rev"))
      .withColumn("prev_rev", lag(col("rev"), 1).over(w))
      .select(col("yr").cast("long").as("yr"), col("rev"), col("prev_rev"),
        round((col("rev") - col("prev_rev")) * 100.0 / col("prev_rev"), 4).as("yoy_pct"))
      .orderBy(col("yr"))
  }

  /** Rolling 7-day correlation between two daily series (shipped quantity
    * vs revenue) — the two-input moving statistic the single-series
    * `win_moving_avg`/`win_ewma_frame` family doesn't cover. Spelled as
    * five co-moment window SUMs + the closed-form Pearson ratio rather
    * than corr() itself: ANSI-mode Spark throws on the singleton-frame
    * divide, and the explicit form is engine-portable. Determinism: the
    * daily series is summed in DECIMAL then cast DOUBLE (house policy —
    * row-order FP never leaks), frames are ordered, and ROUND(,4)
    * absorbs the engines' frame-accumulation ulp; the MIN=MAX degenerate
    * guard (exact compare) nulls constant-series frames BEFORE the
    * cancellation-amplified ratio can differ across engines, and NULLIF
    * covers the exact-zero denominator. Partitioned by month, so no
    * global sort: the window input is bounded at ~31 rows per partition
    * regardless of SF (the daily pre-agg is map-side combined). */
  private val rollingCorr = CatalogEntry.ansi(
    "win_rolling_corr",
    """WITH d AS (
      |  SELECT l_shipdate AS d,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      |  FROM lineitem GROUP BY l_shipdate),
      |m AS (
      |  SELECT d, qty, rev,
      |         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
      |         SUM(qty) OVER w AS sx, SUM(rev) OVER w AS sy,
      |         SUM(qty * qty) OVER w AS sxx, SUM(rev * rev) OVER w AS syy,
      |         SUM(qty * rev) OVER w AS sxy,
      |         MIN(qty) OVER w AS qlo, MAX(qty) OVER w AS qhi,
      |         MIN(rev) OVER w AS rlo, MAX(rev) OVER w AS rhi
      |  FROM d
      |  WINDOW w AS (PARTITION BY year(d), month(d) ORDER BY d
      |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT d, qty, rev,
      |       CASE WHEN qlo = qhi OR rlo = rhi THEN NULL
      |            ELSE ROUND((n * sxy - sx * sy) /
      |                 NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0), 4) + 0.0 END AS c7
      |FROM m ORDER BY d""".stripMargin) { (spark, sfDir) =>
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").as("d"))
      .agg(decOut(sum(dec(col("l_quantity")))).as("qty"),
        decOut(sum(dec(col("l_extendedprice")))).as("rev"))
    val w = Window.partitionBy(year(col("d")), month(col("d")))
      .orderBy(col("d")).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum(col("qty")).over(w))
      .withColumn("sy", sum(col("rev")).over(w))
      .withColumn("sxx", sum(col("qty") * col("qty")).over(w))
      .withColumn("syy", sum(col("rev") * col("rev")).over(w))
      .withColumn("sxy", sum(col("qty") * col("rev")).over(w))
      .withColumn("degenerate",
        min(col("qty")).over(w) === max(col("qty")).over(w) ||
          min(col("rev")).over(w) === max(col("rev")).over(w))
      .select(col("d"), col("qty"), col("rev"),
        when(col("degenerate"), lit(null)).otherwise(
          Util.znorm((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), lit(0.0)), 4)).as("c7"))
      .orderBy(col("d"))
  }

  def entries: Seq[CatalogEntry] = Seq(
    rowNumber, rankDense, lagLead, runningSum, movingAvg, rangeFrame,
    ntileQuartiles, firstLast, topkPerGroup, distributionFns, nthValue,
    distinctFrame, movingMedian, rangeInterval, ignoreNulls, ratioToReport,
    cumeDist, gapsIslands, drawdown, ewmaFrame, yoyGrowth, rollingCorr)
}
