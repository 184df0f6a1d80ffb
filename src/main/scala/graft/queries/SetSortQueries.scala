package graft.queries

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.functions._
import Util._

/** Category F — sort / limit / set operations (SURVEY.md §2.1.F).
  *
  * `sort_multi_limit` exercises TakeOrderedAndProject — the top-k plan that
  * never materializes a global sort (each partition keeps k, driver merges),
  * which is exactly the 100-TB-safe shape. Set ops are hash-based
  * (union+distinct / semi / anti under the hood) and shuffle on the full
  * row — projected down to narrow columns first.
  */
object SetSortQueries {

  /** Both sides order by the same raw-double sort key (bit-identical in
    * both engines since it passes through un-arithmetic'd), tie-broken by
    * the unique order key. */
  private val sortMultiLimit = CatalogEntry.ansi(
    "sort_multi_limit",
    """SELECT o_orderkey, o_totalprice AS price, o_orderdate
      |FROM orders
      |ORDER BY price DESC, o_orderkey
      |LIMIT 100""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice").as("price"), col("o_orderdate"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Bag union of two order slices, tagged by origin. */
  private val unionAll = CatalogEntry.ansi(
    "set_union_all",
    """SELECT * FROM (
      |  SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
      |  UNION ALL
      |  SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 400000
      |) ORDER BY o_orderkey, src""".stripMargin) { (spark, sfDir) =>
    val o = Tables.orders(spark, sfDir)
    o.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("src"))
      .unionByName(
        o.where(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), lit("big").as("src")))
      .orderBy(col("o_orderkey"), col("src"))
  }

  /** Set union — the distinct collapses duplicates across both branches. */
  private val unionDistinct = CatalogEntry.ansi(
    "set_union_distinct",
    """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
      |ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    val o = Tables.orders(spark, sfDir)
    o.where(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
      .union(o.where(col("o_totalprice") > 400000).select(col("o_orderkey")))
      .distinct()
      .orderBy(col("o_orderkey"))
  }

  private val intersectSegs = CatalogEntry.ansi(
    "set_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 0
      |ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    val c = Tables.customer(spark, sfDir)
    c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .intersect(c.where(col("c_acctbal") > 0).select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  private val exceptSegs = CatalogEntry.ansi(
    "set_except",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 0
      |ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    val c = Tables.customer(spark, sfDir)
    c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .except(c.where(col("c_acctbal") > 0).select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  /** Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL, the
    * multiplicity-preserving forms the DISTINCT variants above erase (the
    * SQL-standard pair Redshift-genre reconciliation queries lean on:
    * "which rows appear in both extracts, counted with duplicates" is how
    * double-load audits are written). Both engines implement them as one
    * hash aggregation per side keyed on the row (count per key, emit
    * min/diff of the counts) — a single narrow-key shuffle each, no join
    * explosion, which is the 100-TB shape. The two legs are tagged and
    * unioned so one compare covers both; identical rows make the ORDER BY
    * total despite duplicates. */
  private val setOpsAll = CatalogEntry.ansi(
    "set_ops_all",
    """WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'),
      |     b AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A')
      |SELECT tag, k FROM (
      |  SELECT 'int' AS tag, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
      |  UNION ALL
      |  SELECT 'exc' AS tag, k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
      |) u ORDER BY tag, k""".stripMargin) { (spark, sfDir) =>
    val li = Tables.lineitem(spark, sfDir)
    val a = li.where(col("l_returnflag") === "R").select(col("l_partkey").as("k"))
    val b = li.where(col("l_returnflag") === "A").select(col("l_partkey").as("k"))
    a.intersectAll(b).withColumn("tag", lit("int"))
      .union(a.exceptAll(b).withColumn("tag", lit("exc")))
      .select(col("tag"), col("k"))
      .orderBy(col("tag"), col("k"))
  }

  /** UNION by NAME — schema-evolution-tolerant append (two extracts whose
    * column ORDERS differ and one of which is missing a column entirely;
    * positional UNION would silently cross-wire k with src). Spark's
    * surface is the `unionByName(…, allowMissingColumns = true)` Dataset
    * API (no SQL spelling exists there); DuckDB spells it UNION ALL BY
    * NAME with the same null-fill semantics, which makes the oracle a
    * direct restatement rather than a manufactured twin. Sums ride the
    * house DECIMAL-then-DOUBLE policy so the missing-column leg's FP
    * never drifts. Union is a zero-shuffle concatenation; the group-by
    * on the 2-value src key is map-side combined — nothing here scales
    * worse than the scan. */
  private val unionByName = CatalogEntry.dialect(
    "set_union_byname",
    duckdb = """WITH u AS (
               |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,4)) AS v, 'hi' AS src, o_orderpriority AS pri
               |  FROM orders WHERE o_totalprice >= 200000
               |  UNION ALL BY NAME
               |  SELECT 'lo' AS src, CAST(o_totalprice AS DECIMAL(18,4)) AS v, o_orderkey AS k
               |  FROM orders WHERE o_totalprice < 50000
               |)
               |SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
               |       CAST(SUM(v) AS DOUBLE) AS sum_v,
               |       CAST(SUM(CASE WHEN pri IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_pri
               |FROM u GROUP BY src ORDER BY src""".stripMargin,
    spark = """WITH u AS (
              |  SELECT k, v, src, pri FROM (
              |    SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,4)) AS v, 'hi' AS src, o_orderpriority AS pri
              |    FROM orders WHERE o_totalprice >= 200000)
              |  UNION ALL
              |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,4)) AS v, 'lo' AS src, CAST(NULL AS STRING) AS pri
              |  FROM orders WHERE o_totalprice < 50000
              |)
              |SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
              |       CAST(SUM(v) AS DOUBLE) AS sum_v,
              |       CAST(SUM(CASE WHEN pri IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_pri
              |FROM u GROUP BY src ORDER BY src""".stripMargin) { (spark, sfDir) =>
    val orders = Tables.orders(spark, sfDir)
    val hi = orders.where(col("o_totalprice") >= 200000)
      .select(col("o_orderkey").as("k"), dec(col("o_totalprice")).as("v"),
        lit("hi").as("src"), col("o_orderpriority").as("pri"))
    val lo = orders.where(col("o_totalprice") < 50000)
      .select(lit("lo").as("src"), dec(col("o_totalprice")).as("v"),
        col("o_orderkey").as("k"))
    hi.unionByName(lo, allowMissingColumns = true)
      .groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("n"),
        decOut(sum(col("v"))).as("sum_v"),
        sum(when(col("pri").isNull, 1).otherwise(0)).cast("long").as("n_missing_pri"))
      .orderBy(col("src"))
  }

  def entries: Seq[CatalogEntry] = Seq(
    sortMultiLimit, unionAll, unionDistinct, intersectSegs, exceptSegs,
    setOpsAll, unionByName)
}
