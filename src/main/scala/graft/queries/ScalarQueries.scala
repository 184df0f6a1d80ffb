package graft.queries

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import Util._

/** Category B — projection, filtering, scalar expressions (SURVEY.md §2.1.B).
  *
  * Everything here is a narrow map over a columnar scan: stays inside one
  * WholeStageCodegen span with zero shuffles (the final orderBy is the only
  * exchange, and exists purely for the deterministic oracle compare).
  */
object ScalarQueries {

  private val derivedExprs = CatalogEntry.ansi(
    "proj_derived_exprs",
    """SELECT l_orderkey, l_linenumber,
      |       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS disc_price,
      |       CAST(ROUND(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))), 4) AS DOUBLE) AS charge
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, sfDir) =>
    val one = lit(1).cast(DecT)
    Tables.lineitem(spark, sfDir)
      .withColumn("disc_price", dec(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))))
      .withColumn("charge", dec(col("disc_price") * (one + dec(col("l_tax")))))
      .select(col("l_orderkey"), col("l_linenumber"),
        decOut(col("disc_price")).as("disc_price"), decOut(col("charge")).as("charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val filterCompound = CatalogEntry.ansi(
    "filter_compound",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE (o_orderstatus IN ('F', 'P') OR o_orderpriority LIKE '1-%')
      |  AND o_totalprice BETWEEN 50000 AND 200000
      |  AND NOT (o_orderkey % 10 = 0)
      |  AND o_orderdate IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .where((col("o_orderstatus").isin("F", "P") || col("o_orderpriority").like("1-%"))
        && col("o_totalprice").between(50000, 200000)
        && !(col("o_orderkey") % 10 === 0)
        && col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val caseWhen = CatalogEntry.ansi(
    "scalar_case_when",
    """SELECT o_orderkey,
      |       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
      |            WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
      |            ELSE 'low' END AS urgency
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .when(col("o_orderpriority") === "3-MEDIUM", "mid")
          .otherwise("low").as("urgency"))
      .orderBy(col("o_orderkey"))
  }

  /** Cross-type casts. Deliberately avoids double→int (Spark truncates,
    * DuckDB rounds) and double→string (formatting differs). */
  private val casts = CatalogEntry.dialect(
    "scalar_casts",
    duckdb = """SELECT l_orderkey, l_linenumber,
               |       CAST(l_orderkey AS INTEGER) AS okey_i,
               |       CAST(l_linenumber AS DOUBLE) AS ln_d,
               |       CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DOUBLE) AS qty_dec,
               |       CAST(l_shipdate AS DATE) AS ship_d,
               |       CAST(l_orderkey AS VARCHAR) AS okey_s
               |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    spark = """SELECT l_orderkey, l_linenumber,
              |       CAST(l_orderkey AS INT) AS okey_i,
              |       CAST(l_linenumber AS DOUBLE) AS ln_d,
              |       CAST(CAST(l_quantity AS DECIMAL(18,4)) AS DOUBLE) AS qty_dec,
              |       CAST(l_shipdate AS DATE) AS ship_d,
              |       CAST(l_orderkey AS STRING) AS okey_s
              |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").cast("int").as("okey_i"),
        col("l_linenumber").cast("double").as("ln_d"),
        decOut(dec(col("l_quantity"))).as("qty_dec"),
        col("l_shipdate").cast("date").as("ship_d"),
        col("l_orderkey").cast("string").as("okey_s"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val strBasic = CatalogEntry.dialect(
    "str_basic",
    duckdb = """SELECT c_custkey,
               |       upper(c_name) AS up, lower(c_mktsegment) AS lo,
               |       trim(c_name) AS tr, substring(c_name, 1, 8) AS sub,
               |       concat(c_name, '#', c_mktsegment) AS cat,
               |       CAST(length(c_name) AS INTEGER) AS len,
               |       replace(c_name, 'Customer', 'Cust') AS repl,
               |       lpad(c_name, 25, '_') AS pad,
               |       CAST(strpos(c_name, '0') AS INTEGER) AS pos
               |FROM customer ORDER BY c_custkey""".stripMargin,
    spark = """SELECT c_custkey,
              |       upper(c_name) AS up, lower(c_mktsegment) AS lo,
              |       trim(c_name) AS tr, substring(c_name, 1, 8) AS sub,
              |       concat(c_name, '#', c_mktsegment) AS cat,
              |       length(c_name) AS len,
              |       replace(c_name, 'Customer', 'Cust') AS repl,
              |       lpad(c_name, 25, '_') AS pad,
              |       instr(c_name, '0') AS pos
              |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        trim(col("c_name")).as("tr"),
        substring(col("c_name"), 1, 8).as("sub"),
        concat(col("c_name"), lit("#"), col("c_mktsegment")).as("cat"),
        length(col("c_name")).as("len"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
        lpad(col("c_name"), 25, "_").as("pad"),
        instr(col("c_name"), "0").as("pos"))
      .orderBy(col("c_custkey"))
  }

  /** POSIX-safe regex surface. Note DuckDB regexp_replace needs the 'g'
    * flag to match Spark's replace-all semantics. */
  private val strRegex = CatalogEntry.dialect(
    "str_regex",
    duckdb = """SELECT p_partkey,
               |       regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
               |       regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled,
               |       CASE WHEN regexp_matches(p_type, '^(PROMO|ECONOMY)') THEN 1 ELSE 0 END AS is_cheap
               |FROM part ORDER BY p_partkey""".stripMargin,
    spark = """SELECT p_partkey,
              |       regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
              |       regexp_replace(p_type, '[aeiou]', '_') AS devoweled,
              |       CASE WHEN p_type RLIKE '^(PROMO|ECONOMY)' THEN 1 ELSE 0 END AS is_cheap
              |FROM part ORDER BY p_partkey""".stripMargin) { (spark, sfDir) =>
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("devoweled"),
        when(col("p_type").rlike("^(PROMO|ECONOMY)"), 1).otherwise(0).as("is_cheap"))
      .orderBy(col("p_partkey"))
  }

  /** EXTRACT/DATE_TRUNC battery. dayofweek deliberately excluded (Spark
    * 1..7 Sun=1 vs DuckDB 0..6 Sun=0 — SURVEY §2.0.5). */
  private val dateParts = CatalogEntry.dialect(
    "date_parts",
    duckdb = """SELECT event_id,
               |       CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS mo,
               |       CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h,
               |       CAST(minute(ts) AS INTEGER) AS mi,
               |       date_trunc('hour', ts) AS hour_start,
               |       CAST(date_trunc('month', ts) AS DATE) AS month_start
               |FROM events ORDER BY event_id""".stripMargin,
    // Spark's date_trunc coerces NTZ input back to session-tz TIMESTAMP;
    // DuckDB's TIMESTAMP is naive — cast the Spark side back to NTZ so the
    // twin matches the impl (and the written parquet stays naive).
    spark = """SELECT event_id,
              |       CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS mo,
              |       CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h,
              |       CAST(minute(ts) AS INTEGER) AS mi,
              |       CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ) AS hour_start,
              |       CAST(date_trunc('month', ts) AS DATE) AS month_start
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        year(col("ts")).as("y"), month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour_start"),
        // Spark date_trunc returns TIMESTAMP, DuckDB returns DATE for
        // month granularity — pin both sides to DATE (VERDICT.md r1 #3).
        date_trunc("month", col("ts")).cast("date").as("month_start"))
      .orderBy(col("event_id"))
  }

  private val dateArith = CatalogEntry.dialect(
    "date_arith",
    duckdb = """SELECT o_orderkey,
               |       CAST(o_orderdate AS DATE) + 30 AS ship_by,
               |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_left,
               |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_q,
               |       last_day(CAST(o_orderdate AS DATE)) AS month_end
               |FROM orders ORDER BY o_orderkey""".stripMargin,
    spark = """SELECT o_orderkey,
              |       date_add(CAST(o_orderdate AS DATE), 30) AS ship_by,
              |       datediff(DATE '1999-01-01', CAST(o_orderdate AS DATE)) AS days_left,
              |       add_months(CAST(o_orderdate AS DATE), 3) AS plus_q,
              |       last_day(CAST(o_orderdate AS DATE)) AS month_end
              |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("ship_by"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_left"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus_q"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy(col("o_orderkey"))
  }

  /** Math battery over an integer domain; transcendentals rounded to 6
    * decimals (libm last-ulp drift — SURVEY §2.0.3 fallback). */
  private val mathFuncs = CatalogEntry.dialect(
    "math_funcs",
    duckdb = """SELECT p_partkey,
               |       abs(p_size - 25) AS a, CAST(ceil(sqrt(p_size)) AS BIGINT) AS c,
               |       CAST(floor(sqrt(p_size)) AS BIGINT) AS f, pow(p_size, 2) AS p2,
               |       sqrt(p_size) AS sq,
               |       round(ln(p_size), 6) AS lnv, round(log10(p_size), 6) AS lgv,
               |       p_size % 7 AS md, CAST(sign(p_size - 25) AS INTEGER) AS sg
               |FROM part ORDER BY p_partkey""".stripMargin,
    spark = """SELECT p_partkey,
              |       abs(p_size - 25) AS a, ceil(sqrt(p_size)) AS c,
              |       floor(sqrt(p_size)) AS f, pow(p_size, 2) AS p2,
              |       sqrt(p_size) AS sq,
              |       round(ln(p_size), 6) AS lnv, round(log10(p_size), 6) AS lgv,
              |       pmod(p_size, 7) AS md, CAST(signum(p_size - 25) AS INT) AS sg
              |FROM part ORDER BY p_partkey""".stripMargin) { (spark, sfDir) =>
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        abs(col("p_size") - 25).as("a"),
        ceil(sqrt(col("p_size"))).as("c"),
        floor(sqrt(col("p_size"))).as("f"),
        pow(col("p_size"), 2).as("p2"),
        sqrt(col("p_size")).as("sq"),
        round(log(col("p_size")), 6).as("lnv"),
        round(log10(col("p_size")), 6).as("lgv"),
        pmod(col("p_size"), lit(7)).as("md"),
        signum(col("p_size") - 25).cast("int").as("sg"))
      .orderBy(col("p_partkey"))
  }

  /** COALESCE/NULLIF + null-safe equality over a null-extending outer join. */
  private val nullHandling = CatalogEntry.dialect(
    "null_handling",
    duckdb = """SELECT c_custkey, o_orderkey,
               |       COALESCE(o_totalprice, CAST(0 AS DOUBLE)) AS price_or_zero,
               |       NULLIF(o_orderstatus, 'O') AS st_nn,
               |       CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END AS eq_f
               |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
               |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    spark = """SELECT c_custkey, o_orderkey,
              |       COALESCE(o_totalprice, CAST(0 AS DOUBLE)) AS price_or_zero,
              |       NULLIF(o_orderstatus, 'O') AS st_nn,
              |       CASE WHEN o_orderstatus <=> 'F' THEN 1 ELSE 0 END AS eq_f
              |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
              |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin) { (spark, sfDir) =>
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, col("o_custkey") === col("c_custkey"), "left")
      .select(
        col("c_custkey"), col("o_orderkey"),
        coalesce(col("o_totalprice"), lit(0).cast("double")).as("price_or_zero"),
        nullif(col("o_orderstatus"), lit("O")).as("st_nn"),
        when(col("o_orderstatus") <=> "F", 1).otherwise(0).as("eq_f"))
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
  }

  /** The rest of the warehouse string battery — split_part is the
    * Redshift ETL workhorse (key extraction from delimited ids). */
  private val strAdvanced = CatalogEntry.ansi(
    "str_advanced",
    """SELECT c_custkey,
      |       split_part(c_name, '#', 2) AS id_part,
      |       reverse(c_mktsegment) AS rev,
      |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
      |       repeat('-', 3) AS dashes,
      |       left(c_name, 8) AS l8,
      |       right(c_name, 4) AS r4,
      |       CAST(position('0' IN c_name) AS INTEGER) AS pos0
      |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        split_part(col("c_name"), lit("#"), lit(2)).as("id_part"),
        reverse(col("c_mktsegment")).as("rev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("lowered_vowels"),
        expr("repeat('-', 3)").as("dashes"),
        expr("left(c_name, 8)").as("l8"),
        expr("right(c_name, 4)").as("r4"),
        expr("CAST(position('0' IN c_name) AS INT)").as("pos0"))
      .orderBy(col("c_custkey"))
  }

  /** Epoch extraction — the ETL join key between event time and external
    * systems. Only the exact µs integer is shared ground: DuckDB's
    * epoch() ROUNDS to the nearest second while Spark truncates, so the
    * seconds column is floor-divided from µs identically on both sides. */
  private val epochExtract = CatalogEntry.dialect(
    "date_epoch",
    duckdb = """SELECT event_id,
               |       epoch_us(ts) AS e_us,
               |       epoch_us(ts) // 1000000 AS e_sec
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id,
              |       unix_micros(CAST(ts AS TIMESTAMP)) AS e_us,
              |       CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 1000000) AS BIGINT) AS e_sec
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("e_us"),
        floor(unix_micros(col("ts").cast("timestamp")) / 1000000).cast("long").as("e_sec"))
      .orderBy(col("event_id"))
  }

  /** GREATEST/LEAST across columns — both engines skip NULLs (verified),
    * which the outer-join null makes observable. */
  private val greatestLeast = CatalogEntry.ansi(
    "scalar_greatest_least",
    """SELECT c_custkey,
      |       greatest(c_acctbal, o_totalprice, CAST(0 AS DOUBLE)) AS hi,
      |       least(c_acctbal, o_totalprice) AS lo
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |ORDER BY c_custkey, hi, lo NULLS FIRST""".stripMargin) { (spark, sfDir) =>
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("o_custkey") === col("c_custkey"), "left")
      .select(col("c_custkey"),
        greatest(col("c_acctbal"), col("o_totalprice"), lit(0).cast("double")).as("hi"),
        least(col("c_acctbal"), col("o_totalprice")).as("lo"))
      .orderBy(col("c_custkey"), col("hi"), col("lo").asc_nulls_first)
  }

  /** CONVERT_TIMEZONE battery — the warehouse genre's tz-shift operator.
    * Storage stays NTZ/UTC (§2.0.6 pin); this entry renders the stored UTC
    * wall clock in named zones via `from_utc_timestamp` (DST-aware through
    * the JVM tzdata) and round-trips one of them back with
    * `to_utc_timestamp`. Zones cover a negative offset (New_York), a
    * positive one (Paris), a half-hour offset (Kolkata) and a southern-
    * hemisphere DST zone (Sydney). The events corpus spans January 2024
    * only — no zone in the battery crosses a DST transition inside the data
    * range, so every conversion is a fixed shift and the round-trip is
    * exact by construction (ambiguous-local-time policies never engage).
    * Oracle: DuckDB's double `AT TIME ZONE` (naive→tz-aware as UTC, then
    * tz-aware→naive local), validated against python zoneinfo. All outputs
    * cast back to NTZ so the written parquet stays naive (§2.0.6). */
  private val tzConvert = CatalogEntry.dialect(
    "scalar_tz_convert",
    duckdb = """SELECT event_id,
               |       CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS TIMESTAMP) AS ny_local,
               |       CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Paris' AS TIMESTAMP) AS paris_local,
               |       CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Kolkata' AS TIMESTAMP) AS kolkata_local,
               |       CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Australia/Sydney' AS TIMESTAMP) AS sydney_local,
               |       CAST((((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York') AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC' AS TIMESTAMP) AS back_utc,
               |       CAST(EXTRACT(hour FROM (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York') AS INTEGER) AS ny_hour
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id,
              |       CAST(from_utc_timestamp(CAST(ts AS TIMESTAMP), 'America/New_York') AS TIMESTAMP_NTZ) AS ny_local,
              |       CAST(from_utc_timestamp(CAST(ts AS TIMESTAMP), 'Europe/Paris') AS TIMESTAMP_NTZ) AS paris_local,
              |       CAST(from_utc_timestamp(CAST(ts AS TIMESTAMP), 'Asia/Kolkata') AS TIMESTAMP_NTZ) AS kolkata_local,
              |       CAST(from_utc_timestamp(CAST(ts AS TIMESTAMP), 'Australia/Sydney') AS TIMESTAMP_NTZ) AS sydney_local,
              |       CAST(to_utc_timestamp(from_utc_timestamp(CAST(ts AS TIMESTAMP), 'America/New_York'), 'America/New_York') AS TIMESTAMP_NTZ) AS back_utc,
              |       CAST(hour(from_utc_timestamp(CAST(ts AS TIMESTAMP), 'America/New_York')) AS INTEGER) AS ny_hour
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    def local(tz: String) =
      from_utc_timestamp(col("ts").cast("timestamp"), tz).cast("timestamp_ntz")
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        local("America/New_York").as("ny_local"),
        local("Europe/Paris").as("paris_local"),
        local("Asia/Kolkata").as("kolkata_local"),
        local("Australia/Sydney").as("sydney_local"),
        to_utc_timestamp(
          from_utc_timestamp(col("ts").cast("timestamp"), "America/New_York"),
          "America/New_York").cast("timestamp_ntz").as("back_utc"),
        hour(from_utc_timestamp(col("ts").cast("timestamp"), "America/New_York"))
          .cast("int").as("ny_hour"))
      .orderBy(col("event_id"))
  }

  /** Business-day (Mon-Fri) calendar arithmetic via a portable closed form —
    * no engine-specific calendars (§2.0 determinism): every date maps to a
    * business-day INDEX `f(d) = 5·⌊n/7⌋ + min(n mod 7, 5)` where n = days
    * since the Monday anchor 1992-01-06 (before all data; n ≥ 0 so ⌊·⌋ and
    * mod agree across engines). Index differences count business days
    * (validated against numpy busday_count); the inverse map
    * `anchor + 7·⌊i/5⌋ + (i mod 5)` lands add-N-business-days on a weekday
    * always. Weekend dates collapse to the FOLLOWING Monday's index — the
    * documented convention (an order stamped Saturday has the same
    * business-day index as Monday). */
  private val businessDays = CatalogEntry.dialect(
    "date_business_days",
    duckdb = """WITH f AS (
               |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
               |         date_diff('day', DATE '1992-01-06', CAST(o_orderdate AS DATE)) AS n
               |  FROM orders
               |), g AS (
               |  SELECT o_orderkey, od,
               |         5 * CAST(FLOOR(n / 7.0) AS BIGINT) + LEAST(n % 7, 5) AS bidx,
               |         (n % 7) >= 5 AS is_weekend
               |  FROM f
               |)
               |SELECT o_orderkey, od, bidx, is_weekend,
               |       (5 * CAST(FLOOR(date_diff('day', DATE '1992-01-06', DATE '2002-01-07') / 7.0) AS BIGINT)
               |          + LEAST(date_diff('day', DATE '1992-01-06', DATE '2002-01-07') % 7, 5)) - bidx AS bdays_to_anchor,
               |       DATE '1992-01-06' + CAST(7 * CAST(FLOOR((bidx + 5) / 5.0) AS BIGINT) + ((bidx + 5) % 5) AS INT) AS plus5_bd,
               |       DATE '1992-01-06' + CAST(7 * CAST(FLOOR((bidx + 20) / 5.0) AS BIGINT) + ((bidx + 20) % 5) AS INT) AS plus20_bd
               |FROM g ORDER BY o_orderkey""".stripMargin,
    spark = """WITH f AS (
              |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
              |         datediff(CAST(o_orderdate AS DATE), DATE '1992-01-06') AS n
              |  FROM orders
              |), g AS (
              |  SELECT o_orderkey, od,
              |         5 * CAST(FLOOR(n / 7.0) AS BIGINT) + LEAST(n % 7, 5) AS bidx,
              |         (n % 7) >= 5 AS is_weekend
              |  FROM f
              |)
              |SELECT o_orderkey, od, bidx, is_weekend,
              |       (5 * CAST(FLOOR(datediff(DATE '2002-01-07', DATE '1992-01-06') / 7.0) AS BIGINT)
              |          + LEAST(datediff(DATE '2002-01-07', DATE '1992-01-06') % 7, 5)) - bidx AS bdays_to_anchor,
              |       date_add(DATE '1992-01-06', CAST(7 * CAST(FLOOR((bidx + 5) / 5.0) AS BIGINT) + ((bidx + 5) % 5) AS INT)) AS plus5_bd,
              |       date_add(DATE '1992-01-06', CAST(7 * CAST(FLOOR((bidx + 20) / 5.0) AS BIGINT) + ((bidx + 20) % 5) AS INT)) AS plus20_bd
              |FROM g ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    val anchor = lit("1992-01-06").cast("date")
    val n = datediff(col("o_orderdate").cast("date"), anchor)
    def bIndex(days: Column): Column =
      lit(5) * floor(days / 7.0).cast("long") + least(days % 7, lit(5))
    def bDate(idx: Column): Column =
      date_add(anchor, (lit(7) * floor(idx / 5.0).cast("long") + idx % 5).cast("int"))
    val anchorDays = datediff(lit("2002-01-07").cast("date"), anchor)
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        bIndex(n).as("bidx"),
        (n % 7 >= 5).as("is_weekend"),
        (bIndex(anchorDays) - bIndex(n)).as("bdays_to_anchor"),
        bDate(bIndex(n) + 5).as("plus5_bd"),
        bDate(bIndex(n) + 20).as("plus20_bd"))
      .orderBy(col("o_orderkey"))
  }

  /** Bitwise-operator battery (Redshift supports the full C set) — masks,
    * flags and shift arithmetic over BIGINT keys. Pure codegen'd integer
    * ops; DuckDB spells xor as a function where Spark uses `^`. */
  private val bitwiseOps = CatalogEntry.dialect(
    "scalar_bitwise",
    duckdb = """SELECT p_partkey,
               |       p_partkey & 255 AS band,
               |       p_partkey | 4096 AS bor,
               |       xor(p_partkey, 1365) AS bxor,
               |       p_partkey << 2 AS shl,
               |       p_partkey >> 3 AS shr,
               |       ~p_partkey AS bnot
               |FROM part ORDER BY p_partkey""".stripMargin,
    spark = """SELECT p_partkey,
              |       p_partkey & 255 AS band,
              |       p_partkey | 4096 AS bor,
              |       p_partkey ^ 1365 AS bxor,
              |       shiftleft(p_partkey, 2) AS shl,
              |       shiftright(p_partkey, 3) AS shr,
              |       ~p_partkey AS bnot
              |FROM part ORDER BY p_partkey""".stripMargin) { (spark, sfDir) =>
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        col("p_partkey").bitwiseAND(255).as("band"),
        col("p_partkey").bitwiseOR(4096).as("bor"),
        col("p_partkey").bitwiseXOR(1365).as("bxor"),
        shiftleft(col("p_partkey"), 2).as("shl"),
        shiftright(col("p_partkey"), 3).as("shr"),
        bitwise_not(col("p_partkey")).as("bnot"))
      .orderBy(col("p_partkey"))
  }

  /** TO_CHAR-style timestamp → string formatting battery. Pattern dialects
    * differ (Spark date_format/DateTimeFormatter vs DuckDB strftime), so the
    * twin translates each pattern; only numeric, locale-free patterns are
    * used — month/day NAMES are locale-dependent and deliberately excluded
    * (SURVEY §2.0 dialect-drift class). `%j`/`DDD` both zero-pad day-of-year
    * to 3 digits; quarter has no strftime code so both sides concat it. */
  private val dateFormatToChar = CatalogEntry.dialect(
    "date_format_tochar",
    duckdb = """SELECT event_id,
               |       strftime(ts, '%Y-%m') AS ym,
               |       strftime(ts, '%d/%m/%Y') AS dmy,
               |       strftime(ts, '%j') AS doy,
               |       strftime(ts, '%H:%M') AS hm,
               |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS full_ts,
               |       'Q' || CAST(quarter(ts) AS VARCHAR) AS qtr
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id,
              |       date_format(ts, 'yyyy-MM') AS ym,
              |       date_format(ts, 'dd/MM/yyyy') AS dmy,
              |       date_format(ts, 'DDD') AS doy,
              |       date_format(ts, 'HH:mm') AS hm,
              |       date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS full_ts,
              |       CONCAT('Q', CAST(quarter(ts) AS STRING)) AS qtr
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM").as("ym"),
        date_format(col("ts"), "dd/MM/yyyy").as("dmy"),
        date_format(col("ts"), "DDD").as("doy"),
        date_format(col("ts"), "HH:mm").as("hm"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("full_ts"),
        concat(lit("Q"), quarter(col("ts")).cast("string")).as("qtr"))
      .orderBy(col("event_id"))
  }

  /** Oracle-heritage conditional shorthands — DECODE / NVL / NVL2 — that
    * Redshift ships and Spark implements natively (3.2+). DuckDB has none
    * of the three, so the twin restates them as CASE / COALESCE: the entry
    * pins that the shorthand and its expansion are the same function.
    * `null_handling` covers COALESCE/NULLIF themselves. */
  private val decodeNvl = CatalogEntry.dialect(
    "scalar_decode_nvl",
    duckdb = """SELECT p_partkey,
               |       CASE p_type WHEN 'ECONOMY' THEN 'budget' WHEN 'PROMO' THEN 'promo' ELSE 'mid' END AS tier,
               |       COALESCE(NULLIF(p_brand, 'Brand#13'), 'generic') AS brand_nn,
               |       CASE WHEN NULLIF(p_name, '') IS NOT NULL THEN upper(p_type) ELSE 'untyped' END AS nvl2_t
               |FROM part ORDER BY p_partkey""".stripMargin,
    spark = """SELECT p_partkey,
              |       decode(p_type, 'ECONOMY', 'budget', 'PROMO', 'promo', 'mid') AS tier,
              |       nvl(NULLIF(p_brand, 'Brand#13'), 'generic') AS brand_nn,
              |       nvl2(NULLIF(p_name, ''), upper(p_type), 'untyped') AS nvl2_t
              |FROM part ORDER BY p_partkey""".stripMargin) { (spark, sfDir) =>
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        expr("decode(p_type, 'ECONOMY', 'budget', 'PROMO', 'promo', 'mid')").as("tier"),
        expr("nvl(NULLIF(p_brand, 'Brand#13'), 'generic')").as("brand_nn"),
        expr("nvl2(NULLIF(p_name, ''), upper(p_type), 'untyped')").as("nvl2_t"))
      .orderBy(col("p_partkey"))
  }

  /** Numeric TO_CHAR battery — zero-pad, explicit sign, thousands grouping.
    * Grouping is applied to the floor'd BIGINT only (DuckDB refuses `{:,}`
    * on floats, and re-rounding a 2-dp double at a coarser scale is the
    * HALF_UP-vs-half-even tie trap); `%.2f` on the already-2-dp prices is
    * tie-free, so printf ↔ format_string agree byte-for-byte. */
  private val numberFormat = CatalogEntry.dialect(
    "str_number_format",
    duckdb = """SELECT o_orderkey,
               |       printf('%012.2f', o_totalprice) AS padded,
               |       printf('%+.2f', o_totalprice) AS signed,
               |       format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) AS commas
               |FROM orders ORDER BY o_orderkey""".stripMargin,
    spark = """SELECT o_orderkey,
              |       format_string('%012.2f', o_totalprice) AS padded,
              |       format_string('%+.2f', o_totalprice) AS signed,
              |       format_number(CAST(floor(o_totalprice) AS BIGINT), 0) AS commas
              |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        format_string("%012.2f", col("o_totalprice")).as("padded"),
        format_string("%+.2f", col("o_totalprice")).as("signed"),
        format_number(floor(col("o_totalprice")).cast("bigint"), 0).as("commas"))
      .orderBy(col("o_orderkey"))
  }

  /** Error-safe TRY arithmetic — the ETL guard family. Spark 4 runs ANSI
    * mode by default (bad casts and x/0 THROW), so `try_cast`/`try_divide`
    * are the idiomatic guards; DuckDB's TRY_CAST and its NULL-on-zero
    * division are the exact twins. The valid/invalid mix in each column
    * pins both the success and the NULL path. Timestamps pinned to NTZ on
    * the Spark side (same move as `date_parts`). */
  private val tryArith = CatalogEntry.dialect(
    "scalar_try_arith",
    duckdb = """SELECT c_custkey,
               |       TRY_CAST(c_mktsegment AS DOUBLE) AS bad_num,
               |       TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS id_num,
               |       c_acctbal / (c_custkey % 5) AS safe_div,
               |       TRY_CAST(CONCAT('1997-01-', lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0')) AS TIMESTAMP) AS ts_ok,
               |       TRY_CAST(c_mktsegment AS TIMESTAMP) AS ts_bad
               |FROM customer ORDER BY c_custkey""".stripMargin,
    spark = """SELECT c_custkey,
              |       TRY_CAST(c_mktsegment AS DOUBLE) AS bad_num,
              |       TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS id_num,
              |       try_divide(c_acctbal, c_custkey % 5) AS safe_div,
              |       CAST(TRY_CAST(CONCAT('1997-01-', lpad(CAST(c_custkey % 28 + 1 AS STRING), 2, '0')) AS TIMESTAMP) AS TIMESTAMP_NTZ) AS ts_ok,
              |       CAST(TRY_CAST(c_mktsegment AS TIMESTAMP) AS TIMESTAMP_NTZ) AS ts_bad
              |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        expr("TRY_CAST(c_mktsegment AS DOUBLE)").as("bad_num"),
        expr("TRY_CAST(split_part(c_name, '#', 2) AS BIGINT)").as("id_num"),
        try_divide(col("c_acctbal"), col("c_custkey") % 5).as("safe_div"),
        expr("TRY_CAST(CONCAT('1997-01-', lpad(CAST(c_custkey % 28 + 1 AS STRING), 2, '0')) AS TIMESTAMP)")
          .cast("timestamp_ntz").as("ts_ok"),
        expr("TRY_CAST(c_mktsegment AS TIMESTAMP)").cast("timestamp_ntz").as("ts_bad"))
      .orderBy(col("c_custkey"))
  }

  /** Cryptographic-hash battery — MD5 and SHA-256 over names, plus the
    * hash-key idiom every warehouse uses for surrogate/diff keys:
    * `md5(concat_ws('|', cols…))` (one string hash replaces a multi-column
    * compare in CDC and audit joins — cf. `etl_train_test_split`, which
    * already leans on md5 for deterministic splitting). Pure per-row map,
    * stays in one codegen span; both engines emit lowercase hex so the
    * compare is byte-exact. The delimiter pin matters: without it
    * ('ab','c') and ('a','bc') would collide. DuckDB spells SHA-256
    * `sha256(x)`, Spark `sha2(x, 256)` — the one dialect split. */
  private val hashFuncs = CatalogEntry.dialect(
    "scalar_hash_funcs",
    duckdb = """SELECT c_custkey,
               |       md5(c_name) AS h_md5,
               |       sha256(c_name) AS h_sha256,
               |       md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment) AS h_key
               |FROM customer ORDER BY c_custkey""".stripMargin,
    spark = """SELECT c_custkey,
              |       md5(c_name) AS h_md5,
              |       sha2(c_name, 256) AS h_sha256,
              |       md5(c_name || '|' || CAST(c_nationkey AS STRING) || '|' || c_mktsegment) AS h_key
              |FROM customer ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        md5(concat_ws("|", col("c_name"), col("c_nationkey"), col("c_mktsegment")))
          .as("h_key"))
      .orderBy(col("c_custkey"))
  }

  /** ISO-8601 week parts — day-of-week (Monday=1), week number, and ISO
    * week-numbering year, the fiscal-calendar trio behind every weekly
    * rollup. Spark has no `isoyear`, so it is derived by the portable
    * Thursday rule (the ISO year of a date is the calendar year of the
    * Thursday in its week: `year(dt + (3 − weekday(dt)) days)`), and
    * `isodow = weekday(dt) + 1` off Spark's Monday=0 `weekday` — closed-form
    * arithmetic, no engine-specific calendars (same policy as
    * `date_business_days`). The year-boundary rows (early-January dates in
    * ISO week 52/53 of the prior year, late-December dates in week 1 of the
    * next) are the assertion. Distinct dates only: the parts are functional
    * in the date, so the compare stays small. */
  private val isoWeek = CatalogEntry.dialect(
    "date_iso_week",
    duckdb = """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
               |SELECT dt, CAST(isodow(dt) AS BIGINT) AS iso_dow,
               |       CAST(week(dt) AS BIGINT) AS iso_week,
               |       CAST(isoyear(dt) AS BIGINT) AS iso_year
               |FROM d ORDER BY dt""".stripMargin,
    spark = """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
              |SELECT dt, CAST(weekday(dt) + 1 AS BIGINT) AS iso_dow,
              |       CAST(weekofyear(dt) AS BIGINT) AS iso_week,
              |       CAST(year(date_add(dt, 3 - weekday(dt))) AS BIGINT) AS iso_year
              |FROM d ORDER BY dt""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date").as("dt")).distinct()
      .select(col("dt"),
        (weekday(col("dt")) + 1).cast("long").as("iso_dow"),
        weekofyear(col("dt")).cast("long").as("iso_week"),
        year(date_add(col("dt"), lit(3) - weekday(col("dt")))).cast("long").as("iso_year"))
      .orderBy(col("dt"))
  }

  /** URL decomposition — protocol/host/path/query plus one named query
    * parameter, via Spark's dedicated `parse_url` (a real surface Spark
    * ships that generic SQL lacks: the DuckDB oracle restates each part as
    * an RFC-3986-shaped regex, which doubles as the spec of what parse_url
    * is asserted to return). URLs are manufactured deterministically from
    * document attributes — same technique as `text_url_canonicalize`, which
    * handles the messy-variant canonicalization; this entry is the clean
    * structural-extraction half. Pure per-row map in one codegen span. */
  private val urlParse = CatalogEntry.dialect(
    "scalar_url_parse",
    duckdb = """WITH urls AS (
               |  SELECT doc_id,
               |    'https://www.' || source || '.example.com/docs/p' || CAST(doc_id % 50 AS VARCHAR) ||
               |    '?id=' || CAST(doc_id % 100 AS VARCHAR) || '&lang=' || lang || '#top' AS url
               |  FROM documents
               |)
               |SELECT doc_id,
               |  regexp_extract(url, '^([a-z]+)://', 1) AS proto,
               |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
               |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
               |  regexp_extract(url, '\?([^#]*)', 1) AS query,
               |  regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param
               |FROM urls ORDER BY doc_id""".stripMargin,
    spark = """WITH urls AS (
              |  SELECT doc_id,
              |    'https://www.' || source || '.example.com/docs/p' || CAST(doc_id % 50 AS STRING) ||
              |    '?id=' || CAST(doc_id % 100 AS STRING) || '&lang=' || lang || '#top' AS url
              |  FROM documents
              |)
              |SELECT doc_id,
              |  parse_url(url, 'PROTOCOL') AS proto,
              |  parse_url(url, 'HOST') AS host,
              |  parse_url(url, 'PATH') AS path,
              |  parse_url(url, 'QUERY') AS query,
              |  parse_url(url, 'QUERY', 'id') AS id_param
              |FROM urls ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(lit("https://www."), col("source"), lit(".example.com/docs/p"),
          (col("doc_id") % 50).cast("string"),
          lit("?id="), (col("doc_id") % 100).cast("string"),
          lit("&lang="), col("lang"), lit("#top")).as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("PROTOCOL")).as("proto"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("id_param"))
      .orderBy(col("doc_id"))
  }

  /** SQL-standard WIDTH_BUCKET — equi-width histogram bucketing with the
    * standard's edge semantics (below-range → 0, at-or-above the upper
    * bound → n+1, else floor((x−lo)·n/(hi−lo))+1). Spark ships the function;
    * DuckDB 1.0 does not, so the oracle restates the definition in
    * arithmetic — which doubles as the semantics pin, exactly like
    * `scalar_url_parse`'s regex restatement. Bounds 0/50 over the integral
    * quantity column put every input and bucket edge on exact FP values, so
    * the floor can't straddle an ulp between engines. The per-bucket
    * rollup keeps the compare small; `agg_histogram_fixed` is the
    * hand-rolled cousin without the standard's edge rows. */
  private val widthBucket = CatalogEntry.dialect(
    "scalar_width_bucket",
    duckdb = """SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM (
               |  SELECT CASE WHEN l_quantity < 0 THEN 0
               |              WHEN l_quantity >= 50 THEN 11
               |              ELSE CAST(floor(l_quantity * 10 / 50) AS BIGINT) + 1 END AS b
               |  FROM lineitem) t GROUP BY b ORDER BY b""".stripMargin,
    spark = """SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM (
              |  SELECT width_bucket(l_quantity, 0, 50, 10) AS b
              |  FROM lineitem) t GROUP BY b ORDER BY b""".stripMargin) { (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .select(width_bucket(col("l_quantity"), lit(0), lit(50), lit(10)).as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("b"))
  }

  /** Fiscal-calendar parts — FY starting July 1 (the most common
    * off-calendar fiscal year): fiscal year, fiscal quarter, and fiscal
    * day-of-year, all closed-form arithmetic off `month()` and a
    * `make_date` fiscal anchor (same no-engine-calendars policy as
    * `date_business_days` / `date_iso_week`; the explicit `floor` in the
    * quarter guards DuckDB's round-half-up BIGINT cast, a §2.0 drift
    * class). Distinct dates only — the parts are functional in the date. */
  private val fiscalCalendar = CatalogEntry.dialect(
    "date_fiscal_calendar",
    duckdb = """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
               |SELECT dt,
               |  CAST(year(dt) + CASE WHEN month(dt) >= 7 THEN 1 ELSE 0 END AS BIGINT) AS fy,
               |  CAST(floor((month(dt) + 5) % 12 / 3) AS BIGINT) + 1 AS fq,
               |  CAST(date_diff('day',
               |       make_date(year(dt) - CASE WHEN month(dt) >= 7 THEN 0 ELSE 1 END, 7, 1),
               |       dt) + 1 AS BIGINT) AS f_doy
               |FROM d ORDER BY dt""".stripMargin,
    spark = """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
              |SELECT dt,
              |  CAST(year(dt) + CASE WHEN month(dt) >= 7 THEN 1 ELSE 0 END AS BIGINT) AS fy,
              |  CAST(floor((month(dt) + 5) % 12 / 3) AS BIGINT) + 1 AS fq,
              |  CAST(datediff(dt,
              |       make_date(year(dt) - CASE WHEN month(dt) >= 7 THEN 0 ELSE 1 END, 7, 1)) + 1 AS BIGINT) AS f_doy
              |FROM d ORDER BY dt""".stripMargin) { (spark, sfDir) =>
    val m = month(col("dt"))
    val fyStart = make_date(
      year(col("dt")) - when(m >= 7, 0).otherwise(1), lit(7), lit(1))
    Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date").as("dt")).distinct()
      .select(col("dt"),
        (year(col("dt")) + when(m >= 7, 1).otherwise(0)).cast("long").as("fy"),
        (floor((m + 5) % 12 / 3).cast("long") + 1).as("fq"),
        (datediff(col("dt"), fyStart) + 1).cast("long").as("f_doy"))
      .orderBy(col("dt"))
  }

  /** Month arithmetic with end-of-month clamping — add_months forward and
    * back plus LAST_DAY and days-remaining-in-month, the billing/aging
    * quartet. The semantics pin is the clamp: Jan 31 + 1 month is Feb 29,
    * not Mar 2, and BOTH engines agree (Spark `add_months`, DuckDB
    * `+ INTERVAL n MONTH`) — but DuckDB's interval addition returns
    * TIMESTAMP where Spark's add_months returns DATE, so the oracle casts
    * back (a §2.0 physical-type drift class, same family as the BIGINT
    * rounding cast in `date_fiscal_calendar`). Distinct dates only. */
  private val monthArith = CatalogEntry.dialect(
    "date_month_arith",
    duckdb = """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
               |SELECT dt,
               |  CAST(dt + INTERVAL 2 MONTH AS DATE) AS plus2m,
               |  CAST(dt - INTERVAL 1 MONTH AS DATE) AS minus1m,
               |  last_day(dt) AS mon_end,
               |  CAST(date_diff('day', dt, last_day(dt)) AS BIGINT) AS days_to_end
               |FROM d ORDER BY dt""".stripMargin,
    spark = """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
              |SELECT dt,
              |  add_months(dt, 2) AS plus2m,
              |  add_months(dt, -1) AS minus1m,
              |  last_day(dt) AS mon_end,
              |  CAST(datediff(last_day(dt), dt) AS BIGINT) AS days_to_end
              |FROM d ORDER BY dt""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date").as("dt")).distinct()
      .select(col("dt"),
        add_months(col("dt"), 2).as("plus2m"),
        add_months(col("dt"), -1).as("minus1m"),
        last_day(col("dt")).as("mon_end"),
        datediff(last_day(col("dt")), col("dt")).cast("long").as("days_to_end"))
      .orderBy(col("dt"))
  }

  /** Redshift/Oracle-style fractional MONTHS_BETWEEN — the last obvious
    * date-surface hole (VERDICT r11 #4). Semantics: whole-month difference
    * plus (day1 − day2)/31.0, EXCEPT when the days-of-month are equal or
    * both dates are month-ends, where the fraction is dropped. DuckDB has
    * no fractional months_between, so the oracle restates that closed form
    * explicitly (`date_business_days` pattern); the Spark side runs the
    * genuine builtin with roundOff=false, whose unrounded result is
    * months.toDouble + dayDiff/31.0 — the identical IEEE ops, probed
    * bit-equal across both engines on the general, both-month-end
    * (1997-02-28 vs 1996-10-31 → 4.0; 1996-03-31 vs 1996-02-29 → 1.0),
    * same-day, and negative cases. Four branches exercised per row: order
    * →ship (general), reversed (negative), month-end pair (integer
    * branch), and a fixed mid-month anchor (varied fractions, both
    * signs). First-line items only; l_linenumber is NOT unique per order
    * in the fixture, so the ORDER BY is total over the date pair. */
  private val monthsBetween = {
    // closed-form MONTHS_BETWEEN(x, y) in DuckDB SQL (x, y are DATE exprs)
    def mb(x: String, y: String): String =
      s"""(year($x) - year($y)) * 12 + (month($x) - month($y))
         | + CASE WHEN day($x) = day($y)
         |          OR ($x = last_day($x) AND $y = last_day($y)) THEN 0.0
         |        ELSE (day($x) - day($y)) / 31.0 END""".stripMargin
    CatalogEntry.dialect(
      "date_months_between",
      duckdb = s"""WITH p AS (
                  |  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS ship_d,
                  |         CAST(o_orderdate AS DATE) AS ord_d
                  |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  |  WHERE l_linenumber = 1
                  |)
                  |SELECT l_orderkey, ship_d, ord_d,
                  |  ${mb("ship_d", "ord_d")} AS mb,
                  |  ${mb("ord_d", "ship_d")} AS mb_rev,
                  |  ${mb("last_day(ship_d)", "last_day(ord_d)")} AS mb_eom,
                  |  ${mb("ship_d", "DATE '1995-06-15'")} AS mb_anchor
                  |FROM p ORDER BY l_orderkey, ship_d, ord_d""".stripMargin,
      spark = """WITH p AS (
                |  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS ship_d,
                |         CAST(o_orderdate AS DATE) AS ord_d
                |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                |  WHERE l_linenumber = 1
                |)
                |SELECT l_orderkey, ship_d, ord_d,
                |  months_between(ship_d, ord_d, false) AS mb,
                |  months_between(ord_d, ship_d, false) AS mb_rev,
                |  months_between(last_day(ship_d), last_day(ord_d), false) AS mb_eom,
                |  months_between(ship_d, DATE '1995-06-15', false) AS mb_anchor
                |FROM p ORDER BY l_orderkey, ship_d, ord_d""".stripMargin) { (spark, sfDir) =>
      val li = Tables.lineitem(spark, sfDir)
        .where(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship_d"))
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("ord_d"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("ship_d"), col("ord_d"),
          months_between(col("ship_d"), col("ord_d"), roundOff = false).as("mb"),
          months_between(col("ord_d"), col("ship_d"), roundOff = false).as("mb_rev"),
          months_between(last_day(col("ship_d")), last_day(col("ord_d")),
            roundOff = false).as("mb_eom"),
          months_between(col("ship_d"), lit("1995-06-15").cast("date"),
            roundOff = false).as("mb_anchor"))
        .orderBy(col("l_orderkey"), col("ship_d"), col("ord_d"))
    }
  }

  /** Case-insensitive semantics via Spark 4 collations — COUNT(DISTINCT)
    * under `UTF8_LCASE` collapses case variants where binary collation
    * keeps them apart (the Redshift CASE_INSENSITIVE column analog, and a
    * genuinely new Spark-4 surface: the collation travels with the VALUE,
    * so every comparison — grouping, distinct, joins — picks it up without
    * rewriting expressions). Mixed-case data is manufactured three ways per
    * customer (UPPER / lower / Initcap by key mod 3); the oracle restates
    * case-insensitive distinct as DISTINCT lower(x), which is exactly
    * UTF8_LCASE's definition for ASCII — the restatement is the
    * semantics pin. */
  private val collationGroup = CatalogEntry.dialect(
    "str_collation_group",
    duckdb = """WITH m AS (
               |  SELECT c_nationkey,
               |    CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
               |         WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
               |         ELSE concat(upper(substr(c_mktsegment, 1, 1)), lower(substr(c_mktsegment, 2))) END AS seg
               |  FROM customer
               |)
               |SELECT c_nationkey, CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_raw,
               |       CAST(COUNT(DISTINCT lower(seg)) AS BIGINT) AS n_ci
               |FROM m GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    spark = """WITH m AS (
              |  SELECT c_nationkey,
              |    CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
              |         WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
              |         ELSE concat(upper(substr(c_mktsegment, 1, 1)), lower(substr(c_mktsegment, 2))) END AS seg
              |  FROM customer
              |)
              |SELECT c_nationkey, CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_raw,
              |       CAST(COUNT(DISTINCT collate(seg, 'UTF8_LCASE')) AS BIGINT) AS n_ci
              |FROM m GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (spark, sfDir) =>
    val seg = when(col("c_custkey") % 3 === 0, upper(col("c_mktsegment")))
      .when(col("c_custkey") % 3 === 1, lower(col("c_mktsegment")))
      .otherwise(concat(upper(substring(col("c_mktsegment"), 1, 1)),
        lower(expr("substr(c_mktsegment, 2)"))))
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), seg.as("seg"))
      .groupBy(col("c_nationkey"))
      .agg(countDistinct(col("seg")).cast("long").as("n_raw"),
        countDistinct(collate(col("seg"), "UTF8_LCASE")).cast("long").as("n_ci"))
      .orderBy(col("c_nationkey"))
  }

  /** TO_NUMBER analog — parse formatted currency strings back to numbers
    * (the ingestion half; `str_number_format` is the presentation half):
    * strip sign/symbol/thousands separators, cast, re-apply the sign. The
    * money strings are manufactured from the balances themselves with the
    * portable int-part/cents construction (DECIMAL math keeps the cents
    * digit exact; DuckDB's `format('{:,}')` and Spark's `format_number`
    * group identically on BIGINT — the same split `str_number_format`
    * pinned, because float grouping is refused by DuckDB), so the
    * round-trip parsed == original is part of what the oracle hash
    * asserts. Negative balances exercise the sign path. */
  private val parseNumber = CatalogEntry.dialect(
    "str_parse_number",
    duckdb = """WITH b AS (
               |  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer
               |), f AS (
               |  SELECT c_custkey,
               |    CASE WHEN bal < 0 THEN '-' ELSE '' END || '$' ||
               |    format('{:,}', CAST(floor(abs(bal)) AS BIGINT)) || '.' ||
               |    lpad(CAST(CAST(abs(bal) * 100 % 100 AS BIGINT) AS VARCHAR), 2, '0') AS money_str
               |  FROM b
               |)
               |SELECT c_custkey, money_str,
               |  CASE WHEN money_str LIKE '-%' THEN -1.0 ELSE 1.0 END *
               |  CAST(replace(replace(replace(money_str, '-', ''), '$', ''), ',', '') AS DOUBLE) AS parsed
               |FROM f ORDER BY c_custkey""".stripMargin,
    spark = """WITH b AS (
              |  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer
              |), f AS (
              |  SELECT c_custkey,
              |    CASE WHEN bal < 0 THEN '-' ELSE '' END || '$' ||
              |    format_number(CAST(floor(abs(bal)) AS BIGINT), 0) || '.' ||
              |    lpad(CAST(CAST(abs(bal) * 100 % 100 AS BIGINT) AS STRING), 2, '0') AS money_str
              |  FROM b
              |)
              |SELECT c_custkey, money_str,
              |  CASE WHEN money_str LIKE '-%' THEN -1.0D ELSE 1.0D END *
              |  CAST(replace(replace(replace(money_str, '-', ''), '$', ''), ',', '') AS DOUBLE) AS parsed
              |FROM f ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    val bal = col("c_acctbal").cast("decimal(18,2)")
    val moneyStr = concat(
      when(bal < 0, "-").otherwise(""), lit("$"),
      format_number(floor(abs(bal)).cast("long"), 0), lit("."),
      lpad(((abs(bal) * 100) % 100).cast("long").cast("string"), 2, "0"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), moneyStr.as("money_str"))
      .select(col("c_custkey"), col("money_str"),
        (when(col("money_str").startsWith("-"), -1.0).otherwise(1.0) *
          regexp_replace(col("money_str"), "[-$,]", "").cast("double")).as("parsed"))
      .orderBy(col("c_custkey"))
  }

  /** MAP-typed columns + map higher-order functions — the one Spark complex
    * type the rest of the catalog never touches (arrays and structs are
    * everywhere; maps are the SUPER-object / hstore-style analog). Per
    * order: build a `MAP<returnflag, line_count>` with `map_from_entries`
    * over the collected per-flag counts, then exercise the map HOF surface —
    * `transform_values` (rescore each count), `map_filter` (drop weak keys
    * AFTER the transform, so the lambda composition order is observable),
    * `map_keys` (sorted key census as a scalar string), `size` — and
    * explode the surviving entries back to scalars. All values are exact
    * BIGINTs (counts), so no numeric policy applies. The map itself never
    * reaches the output (engine-internal, like DECIMAL/VARIANT — §2.0
    * physical-type rules). Oracle: DuckDB restates the same semantics
    * map-free (per-flag counts joined to a per-order key census +
    * HAVING-style predicate on the transformed value) — the map machinery
    * is the Spark surface under test, the relational meaning is identical.
    * Scale: two narrow hash aggs on (orderkey[, flag]) — map-side combined,
    * one shuffle each — and per-order maps are ≤|distinct flags| entries
    * (bounded, 3 here), so rows stay O(|orders|) at any SF. */
  private val mapOps = CatalogEntry.dialect(
    "scalar_map_ops",
    duckdb = """WITH per AS (
               |  SELECT l_orderkey, l_returnflag AS k, COUNT(*) AS v
               |  FROM lineitem WHERE l_orderkey % 97 = 0
               |  GROUP BY 1, 2
               |), census AS (
               |  SELECT l_orderkey,
               |         string_agg(k, ',' ORDER BY k) AS flags,
               |         COUNT(*) AS n_flags
               |  FROM per GROUP BY 1
               |)
               |SELECT per.l_orderkey, census.flags, census.n_flags,
               |       per.k AS rflag, per.v * 10 + 1 AS score
               |FROM per JOIN census USING (l_orderkey)
               |WHERE per.v * 10 + 1 >= 21
               |ORDER BY per.l_orderkey, rflag""".stripMargin,
    spark = """WITH per AS (
              |  SELECT l_orderkey, l_returnflag AS k, COUNT(*) AS v
              |  FROM lineitem WHERE l_orderkey % 97 = 0
              |  GROUP BY 1, 2
              |), m AS (
              |  SELECT l_orderkey,
              |         map_from_entries(sort_array(collect_list(struct(k, v)))) AS mp
              |  FROM per GROUP BY l_orderkey
              |), d AS (
              |  SELECT l_orderkey,
              |         array_join(sort_array(map_keys(mp)), ',') AS flags,
              |         CAST(size(mp) AS BIGINT) AS n_flags,
              |         map_filter(transform_values(mp, (k, v) -> v * 10 + 1),
              |                    (k, v) -> v >= 21) AS m2
              |  FROM m
              |)
              |SELECT l_orderkey, flags, n_flags, rflag, score
              |FROM d LATERAL VIEW explode(m2) t AS rflag, score
              |ORDER BY l_orderkey, rflag""".stripMargin) { (spark, sfDir) =>
    val per = Tables.lineitem(spark, sfDir)
      .where(col("l_orderkey") % 97 === 0)
      .groupBy(col("l_orderkey"), col("l_returnflag").as("k"))
      .agg(count(lit(1)).as("v"))
    val m = per.groupBy(col("l_orderkey"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("k"), col("v"))))).as("mp"))
    m.select(
        col("l_orderkey"),
        array_join(sort_array(map_keys(col("mp"))), ",").as("flags"),
        size(col("mp")).cast("long").as("n_flags"),
        map_filter(transform_values(col("mp"), (_, v) => v * 10 + 1),
          (_, v) => v >= 21).as("m2"))
      .select(col("l_orderkey"), col("flags"), col("n_flags"),
        explode(col("m2")).as(Seq("rflag", "score")))
      .orderBy(col("l_orderkey"), col("rflag"))
  }

  def entries: Seq[CatalogEntry] = Seq(
    derivedExprs, filterCompound, caseWhen, casts, strBasic, strAdvanced,
    strRegex, dateParts, dateArith, mathFuncs, nullHandling, epochExtract,
    greatestLeast, tzConvert, businessDays, bitwiseOps, dateFormatToChar,
    decodeNvl, numberFormat, tryArith, hashFuncs, isoWeek, urlParse,
    widthBucket, fiscalCalendar, monthArith, monthsBetween, collationGroup,
    parseNumber, mapOps)
}
