package graft.queries

import graft.{CatalogEntry, Tables}

/** Category G — subqueries (SURVEY.md §2.1.G).
  *
  * These run through spark.sql over registered views on purpose: the point
  * is Catalyst's decorrelation — RewritePredicateSubquery turns the
  * correlated EXISTS / IN into left-semi joins, and the scalar subquery
  * becomes a broadcast-joined single-row plan. PlanShapeSpec asserts the
  * semi-join shows up; at 100 TB that rewrite is the difference between a
  * join and a per-row re-scan.
  */
object SubqueryQueries {

  /** Orders above the global average price. The average is computed as
    * exact decimal SUM / COUNT on both sides (never AVG(double) — §2.0.3);
    * the threshold carries enough fractional digits that the strict `>`
    * cannot straddle engine float drift. */
  private val scalarUncorr = CatalogEntry.ansi(
    "subq_scalar_uncorr",
    """SELECT o_orderkey, o_totalprice AS price
      |FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(18,4)) >
      |      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(18,4)) FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT o_orderkey, o_totalprice AS price
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) >
        |      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(18,4)) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q4-shaped correlated EXISTS — Catalyst decorrelates to a
    * left-semi join (asserted in PlanShapeSpec). */
  private val correlatedExists = CatalogEntry.ansi(
    "subq_correlated_exists",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, sfDir) =>
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** IN subquery → semi-join. Keys are non-nullable so IN is safe here
    * (on nullable columns the engine's NOT IN three-valued-logic trap
    * applies — that path is covered by join_left_anti's NOT EXISTS). */
  private val inSubquery = CatalogEntry.ansi(
    "subq_in",
    """SELECT p_partkey, p_name
      |FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      |ORDER BY p_partkey""".stripMargin) { (spark, sfDir) =>
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT p_partkey, p_name
        |FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin)
  }

  /** Correlated SCALAR subquery — the third decorrelation shape after
    * EXISTS and IN: a per-row aggregate lookup. Catalyst rewrites it to a
    * left outer join against the pre-aggregated subquery (customers with
    * no orders keep a NULL max) — at 100 TB that rewrite is ONE shuffle
    * join versus |customer| re-scans of orders. PlanShapeSpec asserts the
    * aggregate+outer-join shape. MAX is order-insensitive, so no decimal
    * laundering is needed on a double column. */
  private val correlatedScalar = CatalogEntry.ansi(
    "subq_correlated_scalar",
    """SELECT c_custkey,
      |       (SELECT MAX(o_totalprice) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c
      |ORDER BY c_custkey""".stripMargin) { (spark, sfDir) =>
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """SELECT c_custkey,
        |       (SELECT MAX(o_totalprice) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin)
  }

  def entries: Seq[CatalogEntry] =
    Seq(scalarUncorr, correlatedExists, inSubquery, correlatedScalar)
}
