package graft.queries

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Category H — ETL patterns as operators (SURVEY.md §2.1.H).
  *
  * These are the reference genre's raison d'être: staged load → dedup →
  * merge/upsert → derived dims → audit. Each pattern is one shuffle on its
  * natural key (dedup/merge keys), which is exactly how it scales — the
  * 100-TB version of `etl_merge_upsert` is the same full-outer join,
  * hash-partitioned on the merge key across executors.
  */
object EtlQueries {

  private val dedupExact = CatalogEntry.ansi(
    "etl_dedup_exact",
    """SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_suppkey, l_returnflag, l_linestatus""".stripMargin) { (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_suppkey"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Keep-latest-per-key — the Redshift staged-upsert dedup. One window
    * shuffle on the key; ties broken by event_id so the pick is total. */
  private val dedupLatest = CatalogEntry.ansi(
    "etl_dedup_latest",
    """SELECT user_id, event_id, ts, event_type FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("user_id"))
  }

  /** MERGE: target = per-user profile from January's first half; staging =
    * second half. Matched keys take the staging values (update), unmatched
    * staging keys insert, unmatched target keys persist — expressed as a
    * full-outer join + per-column COALESCE(staging, target). */
  private val mergeUpsert = CatalogEntry.ansi(
    "etl_merge_upsert",
    """WITH target AS (
      |  SELECT user_id, COUNT(*) AS n_events, max(ts) AS last_seen
      |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id
      |), staging AS (
      |  SELECT user_id, COUNT(*) AS n_events, max(ts) AS last_seen
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id
      |)
      |SELECT COALESCE(s.user_id, t.user_id) AS user_id,
      |       COALESCE(s.n_events, t.n_events) AS n_events,
      |       COALESCE(s.last_seen, t.last_seen) AS last_seen,
      |       CASE WHEN s.user_id IS NULL THEN 'kept'
      |            WHEN t.user_id IS NULL THEN 'inserted'
      |            ELSE 'updated' END AS merge_action
      |FROM staging s FULL JOIN target t ON s.user_id = t.user_id
      |ORDER BY user_id""".stripMargin) { (spark, sfDir) =>
    val ev = Tables.events(spark, sfDir)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    def profile(df: DataFrame) = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_seen"))
    val target  = profile(ev.where(col("ts") < cut))
      .select(col("user_id").as("t_user"), col("n_events").as("t_n"), col("last_seen").as("t_ls"))
    val staging = profile(ev.where(col("ts") >= cut))
      .select(col("user_id").as("s_user"), col("n_events").as("s_n"), col("last_seen").as("s_ls"))
    staging.join(target, col("s_user") === col("t_user"), "full")
      .select(
        coalesce(col("s_user"), col("t_user")).as("user_id"),
        coalesce(col("s_n"), col("t_n")).as("n_events"),
        coalesce(col("s_ls"), col("t_ls")).as("last_seen"),
        when(col("s_user").isNull, "kept")
          .when(col("t_user").isNull, "inserted")
          .otherwise("updated").as("merge_action"))
      .orderBy(col("user_id"))
  }

  /** SCD-2 validity intervals: each (user, event) version is valid from its
    * ts until the next one (NULL = current). */
  private val scd2Intervals = CatalogEntry.ansi(
    "etl_scd2_intervals",
    """SELECT user_id, event_id, event_type,
      |       ts AS valid_from,
      |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |       CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |            THEN 1 ELSE 0 END AS is_current
      |FROM events
      |ORDER BY user_id, valid_from, event_id""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        when(lead(col("ts"), 1).over(w).isNull, 1).otherwise(0).as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** The five event types, pinned (FIXTURES.md) — pivot columns are stable
    * without a discovery pass (at 100 TB the discovery scan is the thing
    * to avoid; Redshift pivots hard-code columns the same way). */
  private val pivotTypes = Seq("click", "error", "purchase", "signup", "view")

  private val pivotWide = CatalogEntry.dialect(
    "etl_pivot",
    duckdb = """SELECT user_id,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
               |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    spark = """SELECT user_id,
              |       CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click,
              |       CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error,
              |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase,
              |       CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS signup,
              |       CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view
              |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", pivotTypes)
      .agg(decOut(sum(dec(col("value")))))
      .orderBy(col("user_id"))
  }

  /** Melt the pivot back to long form via the Dataset unpivot API. Null
    * cells (user never produced the type) are dropped on both sides. */
  private val unpivotLong = CatalogEntry.dialect(
    "etl_unpivot",
    duckdb = """WITH p AS (
               |  SELECT user_id,
               |         CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
               |         CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
               |         CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
               |         CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
               |         CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
               |  FROM events GROUP BY user_id
               |)
               |SELECT user_id, event_type, total FROM (
               |  SELECT user_id, 'click' AS event_type, click AS total FROM p
               |  UNION ALL SELECT user_id, 'error', error FROM p
               |  UNION ALL SELECT user_id, 'purchase', purchase FROM p
               |  UNION ALL SELECT user_id, 'signup', signup FROM p
               |  UNION ALL SELECT user_id, 'view', view FROM p
               |) WHERE total IS NOT NULL
               |ORDER BY user_id, event_type""".stripMargin,
    spark = """SELECT user_id, event_type,
              |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
              |FROM events GROUP BY user_id, event_type
              |ORDER BY user_id, event_type""".stripMargin) { (spark, sfDir) =>
    val wide = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", pivotTypes)
      .agg(decOut(sum(dec(col("value")))))
    wide.unpivot(
        Array(col("user_id")),
        pivotTypes.map(col).toArray,
        "event_type", "total")
      .where(col("total").isNotNull)
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Calendar dimension derived from distinct order dates. Week-of-year is
    * deliberately absent (ISO week numbering differs across engines). */
  private val timeDim = CatalogEntry.ansi(
    "etl_time_dim",
    """SELECT DISTINCT CAST(o_orderdate AS DATE) AS d,
      |       CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |       CAST(month(o_orderdate) AS INTEGER) AS mo,
      |       CAST(day(o_orderdate) AS INTEGER) AS dom
      |FROM orders ORDER BY d""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderdate").cast("date").as("d"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"))
      .distinct()
      .orderBy(col("d"))
  }

  /** Data-quality audit: row counts, domain violations, orphaned FKs (the
    * anti-join counts). Each check is one small agg; the union is the
    * report. */
  private val qualityAudit = CatalogEntry.ansi(
    "etl_quality_audit",
    """SELECT 'lineitem_rows' AS check_name, COUNT(*) AS n FROM lineitem
      |UNION ALL SELECT 'orders_rows', COUNT(*) FROM orders
      |UNION ALL SELECT 'orders_null_custkey', COUNT(*) FROM orders WHERE o_custkey IS NULL
      |UNION ALL SELECT 'lineitem_bad_discount', COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1
      |UNION ALL SELECT 'lineitem_orphan_orders', COUNT(*) FROM lineitem
      |          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL SELECT 'orders_orphan_customer', COUNT(*) FROM orders
      |          WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |ORDER BY check_name""".stripMargin) { (spark, sfDir) =>
    val li = Tables.lineitem(spark, sfDir)
    val o  = Tables.orders(spark, sfDir)
    val c  = Tables.customer(spark, sfDir)
    def chk(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("check_name"), col("n"))
    chk("lineitem_rows", li)
      .unionByName(chk("orders_rows", o))
      .unionByName(chk("orders_null_custkey", o.where(col("o_custkey").isNull)))
      .unionByName(chk("lineitem_bad_discount",
        li.where(col("l_discount") < 0 || col("l_discount") > 1)))
      .unionByName(chk("lineitem_orphan_orders",
        li.join(o, col("o_orderkey") === col("l_orderkey"), "left_anti")))
      .unionByName(chk("orders_orphan_customer",
        o.join(c, col("c_custkey") === col("o_custkey"), "left_anti")))
      .orderBy(col("check_name"))
  }

  /** Gap-filled daily revenue: a dense date spine (data-driven bounds)
    * left-joined to the daily aggregate, missing days zero-filled — the
    * time-series densification every reporting ETL needs. The spine is
    * generated, not scanned (sequence+explode ↔ generate_series), and the
    * daily aggregate is the only pass over the fact table. */
  private val dateSpineFill = CatalogEntry.dialect(
    "etl_date_spine_fill",
    duckdb = """WITH bounds AS (
               |  SELECT min(CAST(o_orderdate AS DATE)) AS lo, max(CAST(o_orderdate AS DATE)) AS hi FROM orders
               |), spine AS (
               |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM bounds
               |), daily AS (
               |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n,
               |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
               |  FROM orders GROUP BY 1
               |)
               |SELECT spine.d AS d, COALESCE(n, 0) AS n,
               |       COALESCE(rev, CAST(0 AS DOUBLE)) AS rev
               |FROM spine LEFT JOIN daily ON spine.d = daily.d
               |ORDER BY d""".stripMargin,
    spark = """WITH bounds AS (
              |  SELECT min(CAST(o_orderdate AS DATE)) AS lo, max(CAST(o_orderdate AS DATE)) AS hi FROM orders
              |), spine AS (
              |  SELECT explode(sequence(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
              |), daily AS (
              |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n,
              |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
              |  FROM orders GROUP BY 1
              |)
              |SELECT spine.d AS d, COALESCE(n, 0) AS n,
              |       COALESCE(rev, CAST(0 AS DOUBLE)) AS rev
              |FROM spine LEFT JOIN daily ON spine.d = daily.d
              |ORDER BY d""".stripMargin) { (spark, sfDir) =>
    val o = Tables.orders(spark, sfDir)
    val bounds = o.agg(
      min(col("o_orderdate").cast("date")).as("lo"),
      max(col("o_orderdate").cast("date")).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY"))).as("d"))
    val daily = o.groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("n"), decOut(sum(dec(col("o_totalprice")))).as("rev"))
      .select(col("d").as("dd"), col("n"), col("rev"))
    spine.join(daily, col("d") === col("dd"), "left")
      .select(col("d"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("rev"), lit(0).cast("double")).as("rev"))
      .orderBy(col("d"))
  }

  /** CTAS / managed-table DDL round-trip — the `create_tables` surface of
    * the warehouse genre (VERDICT r1 #9, r2 #6). `CREATE TABLE AS SELECT`
    * through the SQL front end materializes a MANAGED parquet table in the
    * session catalog (location = spark.sql.warehouse.dir); the entry then
    * reads it back through the catalog, so the oracle checks DDL + write +
    * catalog read as one identity. Dropped and recreated per invocation —
    * the write IS the operator here (unlike sink_bucketed_join's staged
    * layout), and the selected slice is dimension-sized. ScanSpec asserts
    * the table is MANAGED and survives a catalog lookup. */
  private val ctasRoundtrip = CatalogEntry.ansi(
    "etl_ctas_roundtrip",
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_ctas_src")
    spark.sql("DROP TABLE IF EXISTS graft_ctas_customer")
    // the in-memory session catalog does not survive JVMs, but the managed
    // location on disk does: a table created by a previous process is
    // invisible to DROP TABLE yet still blocks CTAS (LOCATION_ALREADY_EXISTS).
    // Clean the orphaned location explicitly.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_ctas_customer")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    spark.sql(
      """CREATE TABLE graft_ctas_customer USING PARQUET AS
        |SELECT c_custkey, c_name, c_mktsegment FROM graft_ctas_src""".stripMargin)
    spark.table("graft_ctas_customer").orderBy(col("c_custkey"))
  }

  /** Deterministic train/eval split — the training-pipeline staple. The
    * assignment is a pure function of the stable key (first hex nibble of
    * md5(doc_id): 3/16 ≈ 18.75% eval), so it is reproducible across runs,
    * engines, and repartitioning — never `rand()`, which at 100 TB makes
    * the split irreproducible and retry-unstable. Verified cross-engine:
    * Spark and DuckDB md5 agree byte-for-byte on the same string input. */
  private val trainTestSplit = CatalogEntry.dialect(
    "etl_train_test_split",
    duckdb = """SELECT lang, split_name, COUNT(*) AS n_docs,
               |       ROUND(SUM(n_chars) * CAST(1.0 AS DOUBLE) / COUNT(*), 4) AS avg_chars
               |FROM (
               |  SELECT lang, n_chars,
               |         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
               |              THEN 'eval' ELSE 'train' END AS split_name
               |  FROM documents
               |)
               |GROUP BY lang, split_name ORDER BY lang, split_name""".stripMargin,
    spark = """SELECT lang, split_name, COUNT(*) AS n_docs,
              |       ROUND(SUM(n_chars) * CAST(1.0 AS DOUBLE) / COUNT(*), 4) AS avg_chars
              |FROM (
              |  SELECT lang, n_chars,
              |         CASE WHEN substring(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1', '2')
              |              THEN 'eval' ELSE 'train' END AS split_name
              |  FROM documents
              |)
              |GROUP BY lang, split_name ORDER BY lang, split_name""".stripMargin) { (spark, sfDir) =>
    val splitName = when(
      substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1", "2"), "eval")
      .otherwise("train")
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars"), splitName.as("split_name"))
      .groupBy(col("lang"), col("split_name"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_chars")) * 1.0 / count(lit(1)), 4).as("avg_chars"))
      .orderBy(col("lang"), col("split_name"))
  }

  /** Stratified deterministic sampling: ~10% per language stratum, ranked
    * by md5(doc_id) so the sample is a reproducible pseudo-random draw
    * (same engine-portability argument as [[trainTestSplit]]). rn*10 ≤ n
    * keeps exactly floor(n/10) rows per stratum regardless of stratum
    * size. One window per stratum key — a single shuffle at any scale. */
  private val stratifiedSample = CatalogEntry.dialect(
    "etl_stratified_sample",
    duckdb = """WITH r AS (
               |  SELECT doc_id, lang,
               |         ROW_NUMBER() OVER (PARTITION BY lang
               |             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               |         COUNT(*) OVER (PARTITION BY lang) AS n_lang
               |  FROM documents
               |)
               |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM r
               |WHERE rn * 10 <= n_lang ORDER BY doc_id""".stripMargin,
    spark = """WITH r AS (
              |  SELECT doc_id, lang,
              |         ROW_NUMBER() OVER (PARTITION BY lang
              |             ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn,
              |         COUNT(*) OVER (PARTITION BY lang) AS n_lang
              |  FROM documents
              |)
              |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM r
              |WHERE rn * 10 <= n_lang ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val byLang = Window.partitionBy(col("lang"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        row_number().over(byLang.orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
          .cast("long").as("rn"),
        count(lit(1)).over(byLang).as("n_lang"))
      .where(col("rn") * 10 <= col("n_lang"))
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("doc_id"))
  }

  /** Incremental high-watermark load — the staple nightly-ETL pattern:
    * the warehouse holds everything loaded so far; the next run reads
    * max(load_key) off the TARGET (one cheap agg, here broadcast as a
    * 1-row scalar), scans only source rows strictly above it, and appends.
    * At 100 TB the `> hwm` predicate lands on the source's partition
    * column, so the incremental scan prunes to the new partitions instead
    * of rescanning history — the filter is visible as a pushed predicate
    * in the plan. The snapshot here is simulated as "orders before
    * 1997-01-01"; output audits the merged table per load phase and month,
    * proving the union covers the full source exactly once (no row lost
    * below the watermark, none duplicated above it). */
  private val incrementalLoad = CatalogEntry.ansi(
    "etl_incremental_load",
    """WITH loaded AS (
      |  SELECT * FROM orders WHERE o_orderdate < DATE '1997-01-01'
      |), wm AS (
      |  SELECT max(o_orderdate) AS hwm FROM loaded
      |), incr AS (
      |  SELECT o.* FROM orders o CROSS JOIN wm WHERE o.o_orderdate > wm.hwm
      |), merged AS (
      |  SELECT 'initial' AS phase, o_orderdate, o_totalprice FROM loaded
      |  UNION ALL
      |  SELECT 'incremental' AS phase, o_orderdate, o_totalprice FROM incr
      |)
      |SELECT phase,
      |       CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM merged GROUP BY phase, year(o_orderdate) * 100 + month(o_orderdate)
      |ORDER BY phase, ym""".stripMargin) { (spark, sfDir) =>
    val orders = Tables.orders(spark, sfDir)
    val loaded = orders.where(col("o_orderdate") < lit("1997-01-01").cast("date"))
    val hwm = loaded.agg(max(col("o_orderdate")).as("hwm"))
    val incr = orders.join(broadcast(hwm), col("o_orderdate") > col("hwm")).drop("hwm")
    loaded.select(lit("initial").as("phase"), col("o_orderdate"), col("o_totalprice"))
      .unionByName(incr.select(
        lit("incremental").as("phase"), col("o_orderdate"), col("o_totalprice")))
      .groupBy(col("phase"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"))
      .agg(count(lit(1)).as("n"), decOut(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("phase"), col("ym"))
  }

  /** CDC snapshot diff: classify every key across two table snapshots as
    * Insert / Update / Delete (unchanged rows drop out) — the change feed a
    * warehouse emits when it only has full snapshots, and the inverse of
    * [[mergeUpsert]]. One full-outer join hash-partitioned on the key is
    * the whole cost; at 100 TB both snapshots shuffle once on o_orderkey
    * and AQE handles any key skew. The two "snapshots" are deterministic
    * slices of orders: old = keys not divisible by 50, new = keys not
    * divisible by 37 with prices shifted by +1000.0 on keys divisible by
    * 11 (exact IEEE double add, so value equality is engine-portable). */
  private val cdcDiff = CatalogEntry.ansi(
    "etl_cdc_diff",
    """WITH old AS (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 50 <> 0
      |), new AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1000.0
      |              ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 37 <> 0
      |)
      |SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
      |       CASE WHEN old.o_orderkey IS NULL THEN 'I'
      |            WHEN new.o_orderkey IS NULL THEN 'D'
      |            ELSE 'U' END AS change_type
      |FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
      |WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
      |   OR old.o_totalprice <> new.o_totalprice
      |ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    val orders = Tables.orders(spark, sfDir)
    val old = orders.where(col("o_orderkey") % 50 =!= 0)
      .select(col("o_orderkey").as("old_key"), col("o_totalprice").as("old_price"))
    val neu = orders.where(col("o_orderkey") % 37 =!= 0)
      .select(col("o_orderkey").as("new_key"),
        when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")).as("new_price"))
    old.join(neu, col("old_key") === col("new_key"), "full_outer")
      .where(col("old_key").isNull || col("new_key").isNull ||
        col("old_price") =!= col("new_price"))
      .select(coalesce(col("old_key"), col("new_key")).as("o_orderkey"),
        when(col("old_key").isNull, "I")
          .when(col("new_key").isNull, "D")
          .otherwise("U").as("change_type"))
      .orderBy(col("o_orderkey"))
  }

  /** Ordered-stage funnel (view ≥→ click ≥→ purchase): per user, the first
    * view, the first click at-or-after that view, the first purchase
    * at-or-after that click; output is the stage-survivor counts. Each
    * stage is an equi-join + min-agg ON THE SAME user_id key, so all three
    * stages reuse one hash partitioning and the frames narrow
    * monotonically — the standard product-analytics funnel at any scale.
    * (A single-pass `flatMapGroupsWithState` variant exists for streams —
    * see stream_stateful_sessions; batch composes joins instead.) */
  private val eventFunnel = CatalogEntry.ansi(
    "etl_event_funnel",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
      |  GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      |  GROUP BY e.user_id
      |)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase""".stripMargin) {
    (spark, sfDir) =>
      val ev = Tables.events(spark, sfDir)
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("ts") >= col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts") >= col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
  }

  /** Surrogate-key assignment (IDENTITY-column analog): new dimension
    * rows get keys continuing from the existing dimension's max — the
    * nightly dim-load pattern. Keys come from ROW_NUMBER over the natural
    * key, NEVER monotonically_increasing_id: the latter varies with
    * partitioning, so retries/reruns would mint different keys (the
    * determinism contract, SURVEY §2.0.6). The global-order window is a
    * single-partition sort at scale — acceptable for dimensions (they
    * are orders of magnitude smaller than facts); a fact-sized key
    * assignment would instead add per-partition offsets to a
    * partition-local row number — the composite-rank pattern PLANS.md
    * §"Global windows at 100 TB" details (zipWithIndex-style: per-partition
    * counts → prefix offsets → offset + local index). */
  private val surrogateKey = CatalogEntry.ansi(
    "etl_surrogate_key",
    """WITH existing AS (
      |  SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) AS sk
      |  FROM customer WHERE c_custkey % 3 = 0
      |), mx AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM existing
      |), incoming AS (
      |  SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0
      |), assigned AS (
      |  SELECT i.c_custkey, m + ROW_NUMBER() OVER (ORDER BY i.c_custkey) AS sk
      |  FROM incoming i CROSS JOIN mx
      |)
      |SELECT c_custkey, CAST(sk AS BIGINT) AS sk FROM existing
      |UNION ALL
      |SELECT c_custkey, CAST(sk AS BIGINT) AS sk FROM assigned
      |ORDER BY sk""".stripMargin) { (spark, sfDir) =>
    val cust = Tables.customer(spark, sfDir)
    val wAll = Window.orderBy(col("c_custkey"))
    val existing = cust.where(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), row_number().over(wAll).cast("long").as("sk"))
    val mx = existing.agg(count(lit(1)).as("m"))
    val assigned = cust.where(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey"), row_number().over(wAll).cast("long").as("rn"))
      .crossJoin(broadcast(mx))
      .select(col("c_custkey"), (col("m") + col("rn")).as("sk"))
    existing.unionByName(assigned).orderBy(col("sk"))
  }

  /** Deterministic shuffle + shard assignment — the training-data export
    * step: each document lands in a hash shard (the VALUE of the first md5
    * hex digit → 16 balanced buckets, engine-portable where xxhash64 is
    * not; the earlier ascii-codepoint arithmetic collapsed to 10 skewed
    * buckets because 256 ≡ 0 mod 16) and gets a stable position within its
    * shard by hash order, i.e. a reproducible global shuffle with no RNG
    * state. Per-shard sequence numbers come from a window PARTITIONED by
    * shard — never a global ORDER BY window.
    *
    * Scale design: shard count scales with the corpus (100 TB exports use
    * thousands of shards, not 16) so one window partition stays
    * worker-sized; the write path is repartition(shard) +
    * sortWithinPartitions(hk) + partitionBy(shard), which this query's
    * plan shape mirrors exactly (hash-partition exchange, in-partition
    * sort, no global sort until the display ORDER BY). */
  private val shardExport = CatalogEntry.dialect(
    "etl_shard_export",
    duckdb = """WITH h AS (
               |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents
               |), s AS (
               |  SELECT doc_id, hk,
               |         CAST(strpos('0123456789abcdef', substring(hk, 1, 1)) - 1 AS INTEGER) AS shard
               |  FROM h
               |)
               |SELECT doc_id, shard,
               |       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hk, doc_id) AS pos,
               |       COUNT(*) OVER (PARTITION BY shard) AS shard_size
               |FROM s ORDER BY doc_id""".stripMargin,
    spark = """WITH h AS (
              |  SELECT doc_id, md5(CAST(doc_id AS STRING)) AS hk FROM documents
              |), s AS (
              |  SELECT doc_id, hk,
              |         CAST(conv(substring(hk, 1, 1), 16, 10) AS INT) AS shard
              |  FROM h
              |)
              |SELECT doc_id, shard,
              |       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hk, doc_id) AS BIGINT) AS pos,
              |       COUNT(*) OVER (PARTITION BY shard) AS shard_size
              |FROM s ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val h = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hk"))
      .withColumn("shard",
        conv(substring(col("hk"), 1, 1), 16, 10).cast("int"))
    val byShard = Window.partitionBy(col("shard"))
    h.select(col("doc_id"), col("shard"),
        row_number().over(byShard.orderBy(col("hk"), col("doc_id"))).cast("long").as("pos"),
        count(lit(1)).over(byShard).as("shard_size"))
      .orderBy(col("doc_id"))
  }

  /** Partition backfill via dynamic partition overwrite — the "re-run one
    * day" operation every partitioned warehouse needs: the initial load
    * lands a corrupted year-1997 partition (prices zeroed), the backfill
    * rewrites ONLY that partition under
    * `partitionOverwriteMode=dynamic`, and the read-back must equal the
    * clean source. The oracle is maximally sensitive to both failure
    * modes: static overwrite would drop every other year (row-count
    * mismatch), a skipped backfill leaves 1997 totals at zero (hash
    * mismatch). At 100 TB this is the atomic-partition-swap pattern —
    * only the target partition's files are rewritten, sibling years are
    * untouched directories. */
  private val partitionBackfill = CatalogEntry.ansi(
    "etl_partition_backfill",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, sfDir) =>
    val tmp = scratchDir("backfill_sink", sfDir)
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("o_year", year(col("o_orderdate")))
    base.withColumn("o_totalprice",
        when(col("o_year") === 1997, lit(0.0)).otherwise(col("o_totalprice")))
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try base.where(col("o_year") === 1997)
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    spark.read.parquet(tmp)
      .groupBy(col("o_year").cast("int").as("o_year"))
      .agg(count(lit(1)).as("n"), decOut(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("o_year"))
  }

  /** Small-file compaction — the table-maintenance operation every
    * long-lived partitioned warehouse runs (streaming appends and
    * per-task writes strand thousands of KB-sized files; each costs a
    * scan task + open/close + a metadata row, and at 100 TB the metadata
    * alone kills planning). The entry manufactures the problem (64-way
    * fragmented write), then compacts by size: target file count =
    * ceil(bytes / 128 MB), reached via COALESCE — merging partitions
    * without a shuffle, since compaction needs no redistribution
    * (locality re-sorting is `sink_zorder_write`'s job). The oracle is
    * content identity: compaction must move bytes, never change them.
    * ScanSpec asserts the file count actually collapses. */
  private val compactFiles = CatalogEntry.ansi(
    "etl_compact_files",
    """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey""") {
    (spark, sfDir) =>
    val frag = scratchDir("compact_frag", sfDir)
    val out = scratchDir("compact_out", sfDir)
    Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice"))
      .repartition(64).write.mode("overwrite").parquet(frag)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(frag)).getLength
    val targetFiles = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
    spark.read.parquet(frag)
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out).orderBy(col("o_orderkey"))
  }

  /** Sequence-pattern detection (the MATCH_RECOGNIZE / funnels-as-regex
    * analog): each user's event history collapses to an ordered
    * event-initial string, and "view … click … purchase with no purchase
    * in between" is the regex `v[^p]*c[^p]*p` counted per user.
    * Complements `etl_event_funnel` (which asks "did the stages happen in
    * order once") with HOW MANY complete funnels each user ran. One
    * grouped sort per user — the sequence string is bounded by the user's
    * event count, and the regex scan is linear in it. */
  private val seqPattern = CatalogEntry.dialect(
    "etl_seq_pattern",
    duckdb = """WITH s AS (
               |  SELECT user_id,
               |         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
               |  FROM events GROUP BY user_id
               |)
               |SELECT user_id,
               |       CAST(len(regexp_extract_all(seq, 'v[^p]*c[^p]*p')) AS BIGINT) AS n_funnels
               |FROM s ORDER BY user_id""".stripMargin,
    spark = """WITH s AS (
              |  SELECT user_id,
              |         array_join(transform(array_sort(collect_list(
              |           named_struct('t', ts, 'e', event_id, 'i', substring(event_type, 1, 1)))),
              |           x -> x.i), '') AS seq
              |  FROM events GROUP BY user_id
              |)
              |SELECT user_id,
              |       CAST(size(regexp_extract_all(seq, 'v[^p]*c[^p]*p', 0)) AS BIGINT) AS n_funnels
              |FROM s ORDER BY user_id""".stripMargin) { (spark, sfDir) =>
    val seq = array_join(transform(array_sort(collect_list(struct(
      col("ts").as("t"), col("event_id").as("e"),
      substring(col("event_type"), 1, 1).as("i")))), x => x.getField("i")), "")
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(seq.as("seq"))
      .select(col("user_id"),
        size(regexp_extract_all(col("seq"), lit("v[^p]*c[^p]*p"), lit(0)))
          .cast("long").as("n_funnels"))
      .orderBy(col("user_id"))
  }

  /** Per-group quota sampling — the training-data MIX control: cap each
    * language at N documents, chosen by deterministic md5 order (never
    * rand — §2.0.4), i.e. a reproducible uniform draw per group. The
    * companion of `etl_stratified_sample` (which takes a fraction; quotas
    * take a COUNT — how corpus mixes are actually specified). Three-level
    * salted top-k reduction tree (r9 verdict #6 — the first cut must never
    * key on the raw lang group): level 0 windows over (lang, salt-of-256)
    * and keeps each bucket's top-quota by the md5 key, level 1 re-cuts the
    * ≤ 256×quota survivors over (lang, salt-of-16), level 2 re-ranks the
    * ≤ 16×quota rows per lang. Each level is bit-identical to the single
    * global window (a global top-50 row is outranked by < 50 rows, so it
    * is top-50 in every bucket containing it — supersets survive each
    * cut), but no language ever funnels through one partition's sort, and
    * the widest sort any partition performs is over corpus/256 rows: at
    * 100 TB a 50 %-English corpus is the difference between a working plan
    * and a single straggler executor (generalization: fan-out per level ~
    * group-size^(1/levels)). The oracle states the single-window form; the
    * hash-match IS the equivalence proof. */
  private val quotaSample = CatalogEntry.dialect(
    "pipeline_quota_sample",
    duckdb = """SELECT doc_id, lang FROM (
               |  SELECT doc_id, lang,
               |         ROW_NUMBER() OVER (PARTITION BY lang
               |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
               |  FROM documents
               |) WHERE rn <= 50
               |ORDER BY doc_id""".stripMargin,
    spark = """SELECT doc_id, lang FROM (
              |  SELECT doc_id, lang,
              |         ROW_NUMBER() OVER (PARTITION BY lang
              |           ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
              |  FROM documents
              |) WHERE rn <= 50
              |ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    val mdKey = md5(col("doc_id").cast("string"))
    val w0 = Window.partitionBy(col("lang"), col("salt0")).orderBy(mdKey, col("doc_id"))
    val w1 = Window.partitionBy(col("lang"), col("salt1")).orderBy(mdKey, col("doc_id"))
    val w2 = Window.partitionBy(col("lang")).orderBy(mdKey, col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("salt0", pmod(xxhash64(col("doc_id")), lit(256)))
      .withColumn("rn0", row_number().over(w0))
      .where(col("rn0") <= 50)
      .withColumn("salt1", pmod(xxhash64(col("doc_id")), lit(16)))
      .withColumn("rn1", row_number().over(w1))
      .where(col("rn1") <= 50)
      .withColumn("rn", row_number().over(w2))
      .where(col("rn") <= 50)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Batch sessionization — the gap-based session assignment every
    * clickstream warehouse runs nightly (the batch twin of
    * `stream_session_gaps`, which holds the same 6-hour-gap semantics in a
    * watermarked stream). Two stacked windows on ONE (user_id, time) sort:
    * lag marks a session opener when the gap to the previous event exceeds
    * the threshold, and a running sum of openers numbers the sessions —
    * both windows share the same partitioning and ordering, so Spark plans
    * a single shuffle + single per-partition sort, which is exactly the
    * 100-TB shape (sessions never cross user_id, so no global ordering is
    * ever needed). Gap math is integer µs on both sides (`unix_micros` /
    * `epoch_us`) — no second-truncation drift at the 6-hour boundary, and
    * the duration output stays an exact BIGINT (§2.0.3). */
  private val sessionizeBatch = CatalogEntry.dialect(
    "etl_sessionize_batch",
    duckdb = """WITH t AS (
               |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
               |), g AS (
               |  SELECT user_id, event_id, us,
               |         CASE WHEN LAG(us) OVER w IS NULL
               |                OR us - LAG(us) OVER w > 21600000000 THEN 1 ELSE 0 END AS new_s
               |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
               |), s AS (
               |  SELECT user_id, us,
               |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
               |                          ROWS UNBOUNDED PRECEDING) AS session_id
               |  FROM g
               |)
               |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               |       CAST(COUNT(*) AS BIGINT) AS n_events,
               |       CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us
               |FROM s GROUP BY user_id, session_id
               |ORDER BY user_id, session_id""".stripMargin,
    spark = """WITH t AS (
              |  SELECT user_id, event_id, unix_micros(CAST(ts AS TIMESTAMP)) AS us FROM events
              |), g AS (
              |  SELECT user_id, event_id, us,
              |         CASE WHEN LAG(us) OVER w IS NULL
              |                OR us - LAG(us) OVER w > 21600000000 THEN 1 ELSE 0 END AS new_s
              |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
              |), s AS (
              |  SELECT user_id, us,
              |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
              |                          ROWS UNBOUNDED PRECEDING) AS session_id
              |  FROM g
              |)
              |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              |       CAST(COUNT(*) AS BIGINT) AS n_events,
              |       CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us
              |FROM s GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin) { (spark, sfDir) =>
    val gapUs = 21600000000L // 6 h in µs: the corpus' natural session scale
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(wRun).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        (max(col("us")) - min(col("us"))).cast("long").as("dur_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Gap-fill with last-observation-carried-forward — the reporting-layer
    * companion of `etl_date_spine_fill`: that entry builds the spine; this
    * one FILLS it, carrying each user's last known daily revenue across
    * silent days (the standard balance/metric forward-fill). The LOCF is the
    * portable two-window trick — `grp = count(rev) over (user order by dt)`
    * is constant across each null run, then `max(rev) over (user, grp)`
    * broadcasts the run's single non-null head — because DuckDB 1.0 lacks
    * `IGNORE NULLS` (same workaround family as `win_ignore_nulls`). Spines
    * are per-user min→max (never the global range: a 100-TB user set with a
    * long-lived tail would otherwise explode every short-lived user to the
    * full calendar), and both windows share one (user_id, dt) sort. Daily
    * revenue sums go through DECIMAL(18,4) per §2.0.3; the spine starts at
    * each user's first active day, so every null run has a non-null head and
    * `rev_filled` is total. */
  private val gapFillLocf = CatalogEntry.dialect(
    "etl_gap_fill_locf",
    duckdb = """WITH daily AS (
               |  SELECT user_id, CAST(ts AS DATE) AS dt,
               |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS rev
               |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, CAST(ts AS DATE)
               |), spine AS (
               |  SELECT b.user_id, CAST(gs.g AS DATE) AS dt
               |  FROM (SELECT user_id, MIN(dt) AS lo, MAX(dt) AS hi FROM daily GROUP BY user_id) b,
               |       LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS g) gs
               |), j AS (
               |  SELECT s.user_id, s.dt, d.rev,
               |         COUNT(d.rev) OVER (PARTITION BY s.user_id ORDER BY s.dt) AS grp
               |  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.dt = d.dt
               |)
               |SELECT user_id, dt,
               |       CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap,
               |       MAX(rev) OVER (PARTITION BY user_id, grp) AS rev_filled
               |FROM j ORDER BY user_id, dt""".stripMargin,
    spark = """WITH daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS dt,
              |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS rev
              |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, CAST(ts AS DATE)
              |), spine AS (
              |  SELECT user_id, explode(sequence(lo, hi, interval 1 day)) AS dt
              |  FROM (SELECT user_id, MIN(dt) AS lo, MAX(dt) AS hi FROM daily GROUP BY user_id)
              |), j AS (
              |  SELECT s.user_id, s.dt, d.rev,
              |         COUNT(d.rev) OVER (PARTITION BY s.user_id ORDER BY s.dt) AS grp
              |  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.dt = d.dt
              |)
              |SELECT user_id, dt,
              |       CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap,
              |       MAX(rev) OVER (PARTITION BY user_id, grp) AS rev_filled
              |FROM j ORDER BY user_id, dt""".stripMargin) { (spark, sfDir) =>
    val daily = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").cast("date").as("dt"))
      .agg(decOut(sum(dec(col("value")))).as("rev"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("dt")).as("lo"), max(col("dt")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("dt"))
    val wGrp = Window.partitionBy(col("user_id")).orderBy(col("dt"))
    spine.join(daily, Seq("user_id", "dt"), "left")
      .withColumn("grp", count(col("rev")).over(wGrp))
      .withColumn("was_gap", when(col("rev").isNull, 1L).otherwise(0L))
      .withColumn("rev_filled",
        max(col("rev")).over(Window.partitionBy(col("user_id"), col("grp"))))
      .select(col("user_id"), col("dt"), col("was_gap"), col("rev_filled"))
      .orderBy(col("user_id"), col("dt"))
  }

  /** Late-arriving dimension — the fact stream references dimension members
    * the dim table hasn't loaded yet (here: every 7th customer is "not yet
    * arrived"), and the warehouse answer is the UNKNOWN fallback member:
    * facts are NEVER dropped or held back, they roll up under the sentinel
    * and re-attribute once the member lands (Kimball's late-arriving-dim
    * pattern; the inner-join spelling silently loses the revenue, which is
    * the bug this entry pins against). Plan shape: broadcast-able dim left
    * join + coalesce to the sentinel, then one aggregation — the fact side
    * streams, nothing buffers per member. */
  private val lateArrivingDim = CatalogEntry.ansi(
    "etl_late_arriving_dim",
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 7 <> 0
      |), f AS (
      |  SELECT e.user_id, e.value,
      |         COALESCE(d.c_mktsegment, 'UNKNOWN') AS segment
      |  FROM events e LEFT JOIN dim d ON e.user_id = d.c_custkey
      |  WHERE e.event_type = 'purchase'
      |)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM f GROUP BY segment ORDER BY segment""".stripMargin) { (spark, sfDir) =>
    val dim = Tables.customer(spark, sfDir)
      .where(col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        col("user_id"), col("value"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        decOut(sum(dec(col("value")))).as("revenue"))
      .orderBy(col("segment"))
  }

  /** Sequence packing — assign documents to fixed token-budget training
    * bins (512 tokens) by running cumulative sum in a deterministic order,
    * the data-parallel stand-in for greedy first-fit packing (true first-fit
    * is inherently sequential; the cumsum discretization `bin =
    * floor((cum − n_tok)/512)` is the standard distributed approximation —
    * a document goes to the bin its prefix sum opens, so bins overflow by
    * at most one document and never split one). Packing is per-source
    * (PARTITION BY source), which is the scale decision: a single global
    * running sum would funnel the whole corpus through one partition's
    * sort, while per-shard packing — which is how export shards are laid
    * out anyway, cf. `etl_shard_export` — keeps every window local to its
    * hash partition. */
  private val packSequences = CatalogEntry.dialect(
    "etl_pack_sequences",
    duckdb = """WITH t AS (
               |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
               |), c AS (
               |  SELECT source, doc_id, n_tok,
               |         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               |                          ROWS UNBOUNDED PRECEDING) AS cum
               |  FROM t
               |), b AS (
               |  SELECT source, doc_id, n_tok,
               |         CAST(floor(CAST(cum - n_tok AS BIGINT) / 512) AS BIGINT) AS bin
               |  FROM c
               |)
               |SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
               |       CAST(SUM(n_tok) AS BIGINT) AS tokens,
               |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
               |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    spark = """WITH t AS (
              |  SELECT source, doc_id, size(split(text, ' ')) AS n_tok FROM documents
              |), c AS (
              |  SELECT source, doc_id, n_tok,
              |         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              |                          ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM t
              |), b AS (
              |  SELECT source, doc_id, n_tok,
              |         CAST(floor(CAST(cum - n_tok AS BIGINT) / 512) AS BIGINT) AS bin
              |  FROM c
              |)
              |SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |       CAST(SUM(n_tok) AS BIGINT) AS tokens,
              |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
              |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin) { (spark, sfDir) =>
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("n_tok")).cast("long") / 512).cast("long"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("bin"))
  }

  /** FK-orphan audit — the referential-integrity sweep every load pipeline
    * runs before publishing: count child rows whose foreign key has no
    * parent. Two dims are deliberately holed (every 11th customer, every
    * 13th part — late/failed dim loads) so the orphan counts are non-zero
    * and the healthy lineitem→orders edge pins the zero case. Each
    * relationship is one broadcast-or-shuffle left join + conditional
    * count — the anti-join-shaped audit that scales as the joins it
    * mirrors; no row data crosses, only counts. */
  private val fkOrphans = CatalogEntry.ansi(
    "etl_fk_orphans",
    """WITH dim_cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 11 <> 0),
      |     dim_part AS (SELECT p_partkey FROM part WHERE p_partkey % 13 <> 0)
      |SELECT rel, n_child, n_orphan FROM (
      |  SELECT 'orders->customer' AS rel, CAST(COUNT(*) AS BIGINT) AS n_child,
      |         CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
      |  FROM orders o LEFT JOIN dim_cust d ON o.o_custkey = d.c_custkey
      |  UNION ALL
      |  SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT),
      |         CAST(SUM(CASE WHEN d.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN dim_part d ON l.l_partkey = d.p_partkey
      |  UNION ALL
      |  SELECT 'lineitem->orders', CAST(COUNT(*) AS BIGINT),
      |         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |) u ORDER BY rel""".stripMargin) { (spark, sfDir) =>
    def audit(rel: String, child: DataFrame, fk: String,
              parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
      val p = if (bcast) broadcast(parent) else parent
      child.join(p, col(fk) === col(pk), "left")
        .agg(count(lit(1)).cast("long").as("n_child"),
          sum(when(col(pk).isNull, 1).otherwise(0)).cast("long").as("n_orphan"))
        .select(lit(rel).as("rel"), col("n_child"), col("n_orphan"))
    }
    val cust = Tables.customer(spark, sfDir)
      .where(col("c_custkey") % 11 =!= 0).select(col("c_custkey"))
    val prt = Tables.part(spark, sfDir)
      .where(col("p_partkey") % 13 =!= 0).select(col("p_partkey"))
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    audit("orders->customer", orders, "o_custkey", cust, "c_custkey", bcast = true)
      .union(audit("lineitem->part", li, "l_partkey", prt, "p_partkey", bcast = true))
      .union(audit("lineitem->orders", li, "l_orderkey",
        orders.select(col("o_orderkey")), "o_orderkey", bcast = false))
      .orderBy(col("rel"))
  }

  /** Column profiling — the per-column statistics sweep (rows / nulls /
    * distinct / min / max) every ingestion pipeline publishes next to a new
    * table, emitted long-form (one row per column) so downstream checks can
    * join on column name. Built programmatically over a column list — the
    * DataFrame is assembled from one agg per column and unioned, and
    * Catalyst collapses the shared scan; a 100-TB profiler would instead
    * fuse all columns into ONE aggregation pass (count_distinct per column
    * in a single agg) — spelled here as separate legs because exact
    * COUNT(DISTINCT) per column in one pass expands to the same
    * multi-distinct plan `agg_multi_distinct` already exercises. Min/max
    * cast to DOUBLE so one schema fits every numeric column. */
  private val profileColumns = CatalogEntry.ansi(
    "etl_profile_columns",
    """SELECT col, n_rows, n_nulls, n_distinct, mn, mx FROM (
      |  SELECT 'l_quantity' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |         CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |         CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
      |         CAST(MIN(l_quantity) AS DOUBLE) AS mn, CAST(MAX(l_quantity) AS DOUBLE) AS mx
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
      |         CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         CAST(COUNT(DISTINCT l_discount) AS BIGINT),
      |         CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
      |         CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
      |         CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
      |         CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         CAST(COUNT(DISTINCT l_tax) AS BIGINT),
      |         CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
      |  FROM lineitem
      |) u ORDER BY col""".stripMargin) { (spark, sfDir) =>
    val li = Tables.lineitem(spark, sfDir)
    val cols = Seq("l_quantity", "l_discount", "l_extendedprice", "l_tax")
    cols.map { c =>
      li.agg(count(lit(1)).cast("long").as("n_rows"),
          sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as("n_nulls"),
          countDistinct(col(c)).cast("long").as("n_distinct"),
          min(col(c)).cast("double").as("mn"),
          max(col(c)).cast("double").as("mx"))
        .select(lit(c).as("col"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("mn"), col("mx"))
    }.reduce(_ union _).orderBy(col("col"))
  }

  /** Dead-letter routing — classify every inbound row as clean or into a
    * first-match reason code (the quarantine pattern: bad rows are never
    * dropped, they are ROUTED with a reason so reprocessing can target
    * them; `src_csv_badrecords` quarantines rows that fail to PARSE, this
    * entry quarantines rows that parse fine but fail BUSINESS rules).
    * First-match CASE ordering is deliberate and pinned — a row violating
    * two rules lands in the first bucket, keeping routes disjoint so the
    * per-route revenue reconciles to the table total. One scan, one
    * aggregation, no shuffle beyond the 4-row rollup. */
  private val quarantineRouting = CatalogEntry.ansi(
    "etl_quarantine_routing",
    """WITH r AS (
      |  SELECT l_extendedprice,
      |    CASE WHEN l_quantity > 45 THEN 'qty_out_of_range'
      |         WHEN l_discount > 0.08 THEN 'discount_excessive'
      |         WHEN l_tax > 0.06 THEN 'tax_excessive'
      |         ELSE 'ok' END AS route
      |  FROM lineitem
      |)
      |SELECT route, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM r GROUP BY route ORDER BY route""".stripMargin) { (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice"),
        when(col("l_quantity") > 45, "qty_out_of_range")
          .when(col("l_discount") > 0.08, "discount_excessive")
          .when(col("l_tax") > 0.06, "tax_excessive")
          .otherwise("ok").as("route"))
      .groupBy(col("route"))
      .agg(count(lit(1)).cast("long").as("n"),
        decOut(sum(dec(col("l_extendedprice")))).as("revenue"))
      .orderBy(col("route"))
  }

  /** SCD2 change application — the MERGE-into-history step
    * (`etl_scd2_intervals` DERIVES intervals from an event log; this entry
    * APPLIES a change batch to a versioned dim): every changed key's
    * current row is CLOSED at the effective date, and a new current
    * version is INSERTED; untouched keys pass through. One key-partitioned
    * left join + a union with the change batch — the exact 100-TB shape of
    * warehouse MERGE (both legs hash on the business key, nothing is
    * rewritten but the touched keys' rows... and in a real lake the union
    * lands as a partition overwrite, cf. `etl_partition_backfill`).
    * Balance math stays DECIMAL end-to-end (the +100 increment and the
    * output cast) — a double ROUND here would hit the half-even-vs-HALF_UP
    * split (§2.0.3). */
  private val scd2Apply = CatalogEntry.ansi(
    "etl_scd2_apply",
    """WITH dim AS (
      |  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,4)) AS bal0,
      |         DATE '2020-01-01' AS valid_from,
      |         CAST(NULL AS DATE) AS valid_to, 1 AS is_current
      |  FROM customer
      |), chg AS (
      |  SELECT c_custkey,
      |         CAST(c_acctbal AS DECIMAL(18,4)) + 100 AS new_bal,
      |         DATE '2024-06-01' AS eff
      |  FROM customer WHERE c_custkey % 5 = 0
      |)
      |SELECT c_custkey, CAST(bal AS DOUBLE) AS bal, valid_from, valid_to,
      |       CAST(is_current AS BIGINT) AS is_current FROM (
      |  SELECT d.c_custkey, d.bal0 AS bal, d.valid_from,
      |         CASE WHEN c.c_custkey IS NULL THEN d.valid_to ELSE c.eff END AS valid_to,
      |         CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS is_current
      |  FROM dim d LEFT JOIN chg c ON d.c_custkey = c.c_custkey
      |  UNION ALL
      |  SELECT c_custkey, new_bal, eff, CAST(NULL AS DATE), 1 FROM chg
      |) u ORDER BY c_custkey, valid_from""".stripMargin) { (spark, sfDir) =>
    val cust = Tables.customer(spark, sfDir)
    val dim = cust.select(col("c_custkey"), dec(col("c_acctbal")).as("bal0"),
      to_date(lit("2020-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"), lit(1).as("is_current"))
    val chg = cust.where(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("k"), (dec(col("c_acctbal")) + 100).as("new_bal"),
        to_date(lit("2024-06-01")).as("eff"))
    val updated = dim.join(chg, col("c_custkey") === col("k"), "left")
      .select(col("c_custkey"), col("bal0").as("bal"), col("valid_from"),
        when(col("k").isNull, col("valid_to")).otherwise(col("eff")).as("valid_to"),
        when(col("k").isNull, 1L).otherwise(0L).as("is_current"))
    val inserted = chg.select(col("k").as("c_custkey"), col("new_bal").as("bal"),
      col("eff").as("valid_from"), lit(null).cast("date").as("valid_to"),
      lit(1L).as("is_current"))
    updated.union(inserted)
      .select(col("c_custkey"), decOut(col("bal")).as("bal"), col("valid_from"),
        col("valid_to"), col("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Cross-system checksum reconciliation — per-partition row checksums
    * for validating a migration or a dual-write (the "did Redshift and
    * Spark load the same rows" audit). Each row is canonicalized to a
    * delimited string (measure pinned to DECIMAL(18,2) text — double
    * formatting differs across engines, canonical text must not), hashed
    * with a PORTABLE polynomial hash (31-base mod 2³¹−1, integer
    * arithmetic any engine can state — that portability is the whole
    * point: md5-hex can't be summed without engine-specific hex decodes),
    * and SUMmed per year partition. Order-independent by construction
    * (sum of per-row hashes), so two systems compare one small table of
    * (partition, n_rows, checksum) instead of shipping rows. */
  private val checksumReconcile = CatalogEntry.dialect(
    "etl_checksum_reconcile",
    duckdb = """WITH r AS (
               |  SELECT year(o_orderdate) AS yr,
               |         o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
               |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS s
               |  FROM orders
               |), h AS (
               |  SELECT yr,
               |         list_reduce(list_prepend(CAST(0 AS BIGINT),
               |           list_transform(string_split(s, ''), ch -> CAST(ord(ch) AS BIGINT))),
               |           (acc, c) -> (acc * 31 + c) % 2147483647) AS rh
               |  FROM r
               |)
               |SELECT CAST(yr AS BIGINT) AS yr, CAST(COUNT(*) AS BIGINT) AS n_rows,
               |       CAST(SUM(rh) AS BIGINT) AS checksum
               |FROM h GROUP BY yr ORDER BY yr""".stripMargin,
    spark = """WITH r AS (
              |  SELECT year(o_orderdate) AS yr,
              |         o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
              |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS s
              |  FROM orders
              |), h AS (
              |  SELECT yr,
              |         aggregate(transform(sequence(1, length(s)),
              |                             i -> CAST(ascii(substring(s, i, 1)) AS BIGINT)),
              |                   CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % 2147483647) AS rh
              |  FROM r
              |)
              |SELECT CAST(yr AS BIGINT) AS yr, CAST(COUNT(*) AS BIGINT) AS n_rows,
              |       CAST(SUM(rh) AS BIGINT) AS checksum
              |FROM h GROUP BY yr ORDER BY yr""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).as("yr"),
        concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").cast("string")).as("s"))
      .withColumn("rh", expr(
        // sequence+substring, not split(s,''): split's trailing-empty-token
        // behavior changed in SPARK-40194 — an empty token would multiply the
        // hash by 31 and silently diverge from the oracle on older Sparks.
        "aggregate(transform(sequence(1, length(s)), i -> CAST(ascii(substring(s, i, 1)) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % 2147483647)"))
      .groupBy(col("yr").cast("long").as("yr"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("rh")).cast("long").as("checksum"))
      .orderBy(col("yr"))
  }

  /** GDPR-shaped pseudonymization: PII (c_name) replaced by a salted-hash
    * surrogate (stable across runs and joins — the same input always maps
    * to the same pseudonym, unlike random tokenization), quasi-identifiers
    * generalized (acctbal → 1000-wide band), and a k-anonymity audit
    * column: the size of each (nation, band) equivalence class via a
    * keyed window, with a suppression flag for classes below k=2. All
    * map-side except the keyed window and output sort — linear at any
    * scale. Dialect: DuckDB `sha256(x)` vs Spark `sha2(x, 256)`, both
    * lowercase hex. */
  private val pseudonymize = CatalogEntry.dialect(
    "etl_pseudonymize",
    duckdb = """WITH p AS (
               |  SELECT substr(sha256('pep|' || c_name), 1, 16) AS pseudonym,
               |         c_nationkey, CAST(FLOOR(c_acctbal / 1000.0) AS INTEGER) AS bal_band
               |  FROM customer
               |), k AS (
               |  SELECT pseudonym, c_nationkey, bal_band,
               |         COUNT(*) OVER (PARTITION BY c_nationkey, bal_band) AS k_size
               |  FROM p
               |)
               |SELECT pseudonym, c_nationkey, bal_band, k_size,
               |       CASE WHEN k_size < 2 THEN 1 ELSE 0 END AS suppressed
               |FROM k ORDER BY pseudonym""".stripMargin,
    spark = """WITH p AS (
              |  SELECT substr(sha2('pep|' || c_name, 256), 1, 16) AS pseudonym,
              |         c_nationkey, CAST(FLOOR(c_acctbal / 1000.0) AS INTEGER) AS bal_band
              |  FROM customer
              |), k AS (
              |  SELECT pseudonym, c_nationkey, bal_band,
              |         COUNT(*) OVER (PARTITION BY c_nationkey, bal_band) AS k_size
              |  FROM p
              |)
              |SELECT pseudonym, c_nationkey, bal_band, k_size,
              |       CASE WHEN k_size < 2 THEN 1 ELSE 0 END AS suppressed
              |FROM k ORDER BY pseudonym""".stripMargin) { (spark, sfDir) =>
    val p = Tables.customer(spark, sfDir)
      .select(
        sha2(concat(lit("pep|"), col("c_name")), 256).substr(1, 16).as("pseudonym"),
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("int").as("bal_band"))
    val w = Window.partitionBy(col("c_nationkey"), col("bal_band"))
    p.withColumn("k_size", count(lit(1)).over(w))
      .select(col("pseudonym"), col("c_nationkey"), col("bal_band"), col("k_size"),
        when(col("k_size") < 2, 1).otherwise(0).as("suppressed"))
      .orderBy(col("pseudonym"))
  }

  /** k-anonymity suppression — the privacy gate a training-data pipeline
    * runs before export (companion to `etl_pseudonymize`, which hides
    * IDENTIFIERS; this hides rare QUASI-identifier combinations that
    * re-identify by joining: any (region, segment, balance-band) cell
    * with fewer than k=8 members is generalized to the suppressed
    * sentinel). One window count over the QID key then a re-aggregation
    * on the generalized key — two shuffles on low-cardinality keys, no
    * global sort, trivially linear at 100 TB. The balance band is
    * closed-form floor arithmetic (no engine bucket functions), so both
    * engines compute identical cells. */
  private val kAnonymize = CatalogEntry.ansi(
    "etl_k_anonymize",
    """WITH q AS (
      |  SELECT c_custkey, CAST(c_nationkey % 5 AS BIGINT) AS region_b,
      |         CAST(floor((c_acctbal + 1000.0) / 2200.0) AS BIGINT) AS bal_b,
      |         c_mktsegment FROM customer
      |), g AS (
      |  SELECT *, COUNT(*) OVER (PARTITION BY region_b, c_mktsegment, bal_b) AS grp_n FROM q
      |)
      |SELECT CASE WHEN grp_n >= 8 THEN region_b ELSE -1 END AS region_q,
      |       CASE WHEN grp_n >= 8 THEN c_mktsegment ELSE '*' END AS seg_q,
      |       CASE WHEN grp_n >= 8 THEN bal_b ELSE -1 END AS bal_q,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(MIN(grp_n) AS BIGINT) AS min_src_grp
      |FROM g GROUP BY region_q, seg_q, bal_q
      |ORDER BY region_q, seg_q, bal_q""".stripMargin) { (spark, sfDir) =>
    val k = lit(8)
    val q = Tables.customer(spark, sfDir).select(
      col("c_custkey"),
      (col("c_nationkey") % 5).cast("long").as("region_b"),
      floor((col("c_acctbal") + 1000.0) / 2200.0).cast("long").as("bal_b"),
      col("c_mktsegment"))
    val grpN = count(lit(1))
      .over(Window.partitionBy(col("region_b"), col("c_mktsegment"), col("bal_b")))
    q.withColumn("grp_n", grpN)
      .groupBy(
        when(col("grp_n") >= k, col("region_b")).otherwise(lit(-1)).as("region_q"),
        when(col("grp_n") >= k, col("c_mktsegment")).otherwise(lit("*")).as("seg_q"),
        when(col("grp_n") >= k, col("bal_b")).otherwise(lit(-1)).as("bal_q"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("grp_n")).cast("long").as("min_src_grp"))
      .orderBy(col("region_q"), col("seg_q"), col("bal_q"))
  }

  /** One-pass pipeline telemetry via the Observation API — the audit
    * numbers `etl_quality_audit` computes with a dedicated aggregation,
    * collected here as a SIDE EFFECT of a single pass over the facts
    * (Spark's `Dataset.observe` plants a CollectMetrics node; the metrics
    * ride the action that was running anyway). At 100 TB this is the
    * difference between auditing for free and paying a second full scan —
    * the shape Redshift users get from system tables after a COPY. The
    * observed pass here is a count(*) action; the returned frame is the
    * metrics row itself, which the oracle restates as a plain aggregate. */
  private val observeMetrics = CatalogEntry.ansi(
    "etl_observe_metrics",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
      |       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns,
      |       CAST(SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_deep_disc
      |FROM lineitem""".stripMargin) { (spark, sfDir) =>
    val obs = new org.apache.spark.sql.Observation()
    val observed = Tables.lineitem(spark, sfDir).observe(
      obs,
      count(lit(1)).cast("long").as("n_rows"),
      decOut(sum(dec(col("l_quantity")))).as("total_qty"),
      sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("long").as("n_returns"),
      sum(when(col("l_discount") > 0.08, 1).otherwise(0)).cast("long").as("n_deep_disc"))
    observed.foreach(_ => ()) // the pass the pipeline was running anyway
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long],
      m("total_qty").asInstanceOf[Double],
      m("n_returns").asInstanceOf[Long],
      m("n_deep_disc").asInstanceOf[Long]))
      .toDF("n_rows", "total_qty", "n_returns", "n_deep_disc")
  }

  /** Write-once guard for [[pipelineE2e]]'s CSV landing zone — keyed on
    * sfDir alone, the ScanQueries.bucketedStaged convention: the landing
    * zone simulates the SOURCE feed (files an upstream system dropped),
    * which the pipeline consumes but does not produce. Re-writing it per
    * invocation would time an upstream cost inside the pipeline and let
    * concurrent runs clobber each other's files mid-read. */
  private val e2eStaged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The composed end-to-end ETL exemplar (VERDICT r16 #4) — the genre
    * archetype as ONE dependent chain instead of independent entries:
    *
    *   CSV landing zone → schema-enforced staging load → dedup-latest
    *   (latest order per customer) → MERGE-upsert into the customer dim
    *   (full-outer + coalesce) → quality-audit GATE (zero tolerance on
    *   null keys / duplicate keys / FK-orphan inserts, enforced as a
    *   broadcast single-row cross join so a violation empties the output
    *   instead of shipping bad data) → star-join rollup (dim → nation →
    *   region) → partitioned parquet export → the returned frame is the
    *   export READBACK, proving what landed, not what was computed.
    *
    * Artifact-flow policy: the landing zone is write-once per (JVM,
    * sfDir) (upstream's files, not the pipeline's work — see
    * [[e2eStaged]]); the export is REWRITTEN per run (it IS the
    * pipeline's product); everything between is one lazy plan — no
    * intermediate materialization, so Catalyst pushes the staging
    * projection into the CSV scan and plans the dim/nation/region joins
    * as broadcasts. At 100 TB the chain is shuffle-bound on exactly two
    * keys (the dedup window and the merge join share o_custkey — AQE
    * reuses the exchange) plus the |regions×segments|-sized rollup.
    * PlanShapeSpec pins the readback shape and the write-once staging.
    *
    * Oracle: the full chain is plain SQL over the ORIGINAL tables — the
    * CSV round-trip is value-preserving (long/double/date: exact text
    * round-trip on both engines, the src_csv_gzip precedent). */
  private val pipelineE2e = CatalogEntry.ansi(
    "etl_pipeline_e2e",
    """WITH staged AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |         CAST(o_orderdate AS DATE) AS o_orderdate
      |  FROM orders
      |), upd AS (
      |  SELECT o_custkey, o_orderkey AS last_orderkey,
      |         o_orderdate AS last_orderdate, o_totalprice AS last_totalprice
      |  FROM (
      |    SELECT staged.*, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM staged
      |  ) s WHERE rn = 1
      |), dim AS (
      |  SELECT COALESCE(c.c_custkey, u.o_custkey) AS cust_id,
      |         c.c_nationkey, c.c_mktsegment,
      |         u.last_orderkey, u.last_orderdate, u.last_totalprice,
      |         CASE WHEN u.o_custkey IS NULL THEN 'kept'
      |              WHEN c.c_custkey IS NULL THEN 'inserted'
      |              ELSE 'updated' END AS merge_action
      |  FROM customer c FULL JOIN upd u ON c.c_custkey = u.o_custkey
      |), gate AS (
      |  SELECT (SELECT COUNT(*) FROM dim WHERE cust_id IS NULL)
      |       + (SELECT COUNT(*) FROM dim WHERE merge_action = 'inserted')
      |       + (SELECT COUNT(*) FROM (
      |            SELECT cust_id FROM dim GROUP BY cust_id HAVING COUNT(*) > 1
      |          ) dups) AS violations
      |)
      |SELECT r.r_name AS region, d.c_mktsegment AS mktsegment,
      |       COUNT(*) AS n_customers,
      |       COUNT(d.last_orderkey) AS n_with_orders,
      |       CAST(SUM(CAST(d.last_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_last_totalprice,
      |       MAX(d.last_orderdate) AS max_last_orderdate
      |FROM dim d
      |JOIN nation n ON d.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |CROSS JOIN gate
      |WHERE gate.violations = 0
      |GROUP BY r.r_name, d.c_mktsegment
      |ORDER BY region, mktsegment""".stripMargin) { (spark, sfDir) =>
    import org.apache.spark.sql.types.{DateType, DoubleType, LongType, StructField, StructType}
    // 1. landing zone (write-once) + schema-enforced staging load
    val csvDir = scratchDir("e2e_orders_csv", sfDir)
    if (!e2eStaged.contains(sfDir)) e2eStaged.synchronized {
      if (!e2eStaged.contains(sfDir)) {
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderdate").cast("date").as("o_orderdate"))
          .write.mode("overwrite").option("header", "true").csv(csvDir)
        e2eStaged.add(sfDir)
      }
    }
    val stagedSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType), StructField("o_orderdate", DateType)))
    val staged = graft.sources.CsvSource(csvDir, stagedSchema).load(spark)
    // 2. dedup-latest: the staging feed collapses to one row per merge key
    val wLatest = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val upd = staged.withColumn("rn", row_number().over(wLatest))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"),
        col("o_orderdate").as("last_orderdate"),
        col("o_totalprice").as("last_totalprice"))
    // 3. MERGE-upsert into the customer dim (full-outer + coalesce)
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val dim = cust.join(upd, col("c_custkey") === col("o_custkey"), "full")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("cust_id"),
        col("c_nationkey"), col("c_mktsegment"),
        col("last_orderkey"), col("last_orderdate"), col("last_totalprice"),
        when(col("o_custkey").isNull, "kept")
          .when(col("c_custkey").isNull, "inserted")
          .otherwise("updated").as("merge_action"))
    // 4. quality-audit gate: zero null keys, zero duplicate keys, zero
    //    FK-orphan inserts. One single-row frame, broadcast-crossed into
    //    the rollup — a violation empties the export instead of shipping
    //    bad data (the Redshift-era "abort the load" contract, spelled
    //    declaratively).
    val nullAndOrphan = dim.agg(
      coalesce(sum(when(col("cust_id").isNull, 1).otherwise(0)), lit(0)).as("n_null"),
      coalesce(sum(when(col("merge_action") === "inserted", 1).otherwise(0)), lit(0)).as("n_ins"))
    val dupKeys = dim.groupBy(col("cust_id")).agg(count(lit(1)).as("k"))
      .where(col("k") > 1).agg(count(lit(1)).as("n_dup"))
    val gate = nullAndOrphan.crossJoin(dupKeys)
      .select((col("n_null") + col("n_ins") + col("n_dup")).as("violations"))
    // 5. star-join rollup, gated
    val rolled = dim
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .crossJoin(broadcast(gate)).where(col("violations") === 0)
      .groupBy(col("r_name").as("region"), col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        count(col("last_orderkey")).as("n_with_orders"),
        decOut(sum(dec(col("last_totalprice")))).as("sum_last_totalprice"),
        max(col("last_orderdate")).as("max_last_orderdate"))
    // 6. partitioned export + readback: region predicates on the consumer
    //    side become directory pruning; the returned frame reads the SINK,
    //    proving what landed
    val outDir = scratchDir("e2e_export", sfDir)
    rolled.write.mode("overwrite").partitionBy("region").parquet(outDir)
    graft.sources.ParquetSource(outDir).load(spark)
      .select(col("region"), col("mktsegment"), col("n_customers"),
        col("n_with_orders"), col("sum_last_totalprice"), col("max_last_orderdate"))
      .orderBy(col("region"), col("mktsegment"))
  }

  def entries: Seq[CatalogEntry] = Seq(
    pipelineE2e,
    kAnonymize, observeMetrics,
    pseudonymize,
    dedupExact, dedupLatest, mergeUpsert, scd2Intervals, pivotWide,
    unpivotLong, timeDim, qualityAudit, dateSpineFill, ctasRoundtrip,
    trainTestSplit, stratifiedSample, incrementalLoad, cdcDiff, eventFunnel,
    surrogateKey, shardExport, partitionBackfill, compactFiles, seqPattern,
    quotaSample, sessionizeBatch, gapFillLocf, lateArrivingDim, packSequences,
    fkOrphans, profileColumns, quarantineRouting, scd2Apply,
    checksumReconcile)
}
