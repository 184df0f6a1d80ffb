package graft.queries

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import Util._

/** Typed row model for the Dataset[T] exemplar. */
case class TypedOrder(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String, o_totalprice: Double)

/** Category L — UDF / UDAF / UDTF extension surface (SURVEY.md §2.1.L).
  *
  * One oracle-checked exemplar per extension point. Everywhere else the
  * engine uses built-ins: a Scala UDF is codegen-opaque (breaks the
  * WholeStageCodegen span and forces ser/de per row), so the rule at 100 TB
  * is built-ins > custom Catalyst Expression > UDF — these exemplars grade
  * the machinery, not a recommendation.
  */
object UdfQueries {

  /** Scalar UDF: discounted-price band label. Semantics chosen to be
    * CASE-expressible so the oracle can mirror it exactly. */
  private val scalarUdf = CatalogEntry.ansi(
    "udf_scalar_expr",
    """SELECT l_orderkey, l_linenumber,
      |       CASE WHEN l_extendedprice * (1 - l_discount) < 20000 THEN 'low'
      |            WHEN l_extendedprice * (1 - l_discount) < 60000 THEN 'mid'
      |            ELSE 'high' END AS band
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, sfDir) =>
    val band = udf { (price: Double, disc: Double) =>
      val p = price * (1 - disc)
      if (p < 20000) "low" else if (p < 60000) "mid" else "high"
    }
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        band(col("l_extendedprice"), col("l_discount")).as("band"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Typed UDAF via the public Aggregator API: weighted average price over
    * (extendedprice, quantity). Exact BigDecimal sums in the buffer —
    * merge order cannot perturb the result — final division pinned to
    * scale 4 HALF_UP to match the oracle's decimal arithmetic. */
  private object WeightedAvg
      extends Aggregator[(java.math.BigDecimal, java.math.BigDecimal),
                         (java.math.BigDecimal, java.math.BigDecimal),
                         java.math.BigDecimal] {
    private val Z = java.math.BigDecimal.ZERO
    def zero = (Z, Z)
    def reduce(b: (java.math.BigDecimal, java.math.BigDecimal),
               a: (java.math.BigDecimal, java.math.BigDecimal)) =
      (b._1.add(a._1.multiply(a._2)), b._2.add(a._2))
    def merge(x: (java.math.BigDecimal, java.math.BigDecimal),
              y: (java.math.BigDecimal, java.math.BigDecimal)) =
      (x._1.add(y._1), x._2.add(y._2))
    def finish(r: (java.math.BigDecimal, java.math.BigDecimal)) =
      if (r._2.signum == 0) null
      else r._1.divide(r._2, 4, java.math.RoundingMode.HALF_UP)
    def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  }

  private val typedUdaf = CatalogEntry.ansi(
    "udaf_typed_aggregator",
    """SELECT l_returnflag,
      |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) /
      |            SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (spark, sfDir) =>
      val wavg = udaf(WeightedAvg)
      Tables.lineitem(spark, sfDir)
        .groupBy(col("l_returnflag"))
        .agg(wavg(dec(col("l_extendedprice")), dec(col("l_quantity")))
          .cast("decimal(38,4)").cast("double").as("wavg_price"))
        .orderBy(col("l_returnflag"))
  }

  /** Table-generating exemplar: positional token explode (the built-in
    * Generator path — a custom Generator subclass would slot in the same
    * way, but posexplode covers the semantics). */
  private val udtfGenerator = CatalogEntry.dialect(
    "udtf_generator",
    duckdb = """SELECT doc_id, pos, token FROM (
               |  SELECT doc_id, CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
               |         unnest(string_split(text, ' ')) AS token
               |  FROM documents
               |) WHERE doc_id < 100
               |ORDER BY doc_id, pos""".stripMargin,
    spark = """SELECT doc_id, pos, token
              |FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, token) FROM documents)
              |WHERE doc_id < 100
              |ORDER BY doc_id, pos""".stripMargin) { (spark, sfDir) =>
    Tables.documents(spark, sfDir)
      .where(col("doc_id") < 100)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Typed Dataset exemplar: case-class Encoders give compile-time field
    * checks; the filter/select here stays fully Catalyst-optimizable
    * because it uses Column expressions on the typed view (typed lambdas
    * would be codegen-opaque — same rule as UDFs). */
  private val typedDataset = CatalogEntry.ansi(
    "typed_dataset_ops",
    """SELECT o_orderkey, o_orderstatus,
      |       o_totalprice AS price
      |FROM orders
      |WHERE o_totalprice > 300000 AND o_orderstatus = 'O'
      |ORDER BY o_orderkey""".stripMargin) { (spark, sfDir) =>
    import spark.implicits._
    val typed: org.apache.spark.sql.Dataset[TypedOrder] =
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .as[TypedOrder]
    typed
      .filter(col("o_totalprice") > 300000 && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").as("price"))
      .orderBy(col("o_orderkey"))
  }

  /** SQL-defined functions (SPARK-46246, Spark 4.0) — the Redshift
    * `CREATE FUNCTION ... RETURN` SQL-UDF analog and the one extension
    * point in this category that is NOT host-language code: the body is a
    * SQL expression Catalyst INLINES at resolution, so unlike the Scala
    * `udf()` exemplar above it stays inside WholeStageCodegen and keeps
    * predicate pushdown — at 100 TB a SQL UDF is an abstraction with zero
    * execution cost, which is why it is preferred over a JVM UDF whenever
    * the logic is expressible. Three resolution behaviors under test:
    * a scalar function over a column, a scalar function CALLING the first
    * (nested resolution), and a TABLE function invoked with a CORRELATED
    * lateral argument (`LATERAL slots(o_orderkey % 3 + 1)` — the TVF form
    * of the join_lateral_topk surface). Functions are session-temporary;
    * the entry creates them idempotently (OR REPLACE) on each run. Oracle:
    * DuckDB inlines the bodies (tier CASE, rank CASE, generate_series
    * unnest) — exactly what Catalyst does internally, stated explicitly. */
  private val sqlFunction = CatalogEntry.dialect(
    "udf_sql_function",
    duckdb = """SELECT o_orderkey,
               |  CASE WHEN o_totalprice < 50000 THEN 'low'
               |       WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS tier,
               |  CASE WHEN o_totalprice < 50000 THEN 1
               |       WHEN o_totalprice < 150000 THEN 2 ELSE 3 END AS rk,
               |  CAST(i AS INTEGER) AS slot
               |FROM orders, LATERAL (
               |  SELECT unnest(generate_series(1, CAST(o_orderkey % 3 + 1 AS INTEGER))) AS i) t
               |WHERE o_orderkey % 31 = 0
               |ORDER BY o_orderkey, slot""".stripMargin,
    spark = """SELECT o_orderkey,
              |  CASE WHEN o_totalprice < 50000 THEN 'low'
              |       WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS tier,
              |  CASE WHEN o_totalprice < 50000 THEN 1
              |       WHEN o_totalprice < 150000 THEN 2 ELSE 3 END AS rk,
              |  i AS slot
              |FROM orders LATERAL VIEW explode(sequence(1, CAST(o_orderkey % 3 + 1 AS INT))) t AS i
              |WHERE o_orderkey % 31 = 0
              |ORDER BY o_orderkey, slot""".stripMargin) { (spark, sfDir) =>
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_sqlfn_orders")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_price_tier(p DOUBLE) RETURNS STRING
        |RETURN CASE WHEN p < 50000 THEN 'low'
        |            WHEN p < 150000 THEN 'mid' ELSE 'high' END""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_tier_rank(p DOUBLE) RETURNS INT
        |RETURN CASE graft_price_tier(p) WHEN 'low' THEN 1 WHEN 'mid' THEN 2 ELSE 3 END""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_slots(n INT) RETURNS TABLE(i INT)
        |RETURN SELECT explode(sequence(1, n)) AS i""".stripMargin)
    spark.sql(
      """SELECT o_orderkey,
        |  graft_price_tier(o_totalprice) AS tier,
        |  graft_tier_rank(o_totalprice) AS rk,
        |  i AS slot
        |FROM graft_sqlfn_orders,
        |  LATERAL graft_slots(CAST(o_orderkey % 3 + 1 AS INT))
        |WHERE o_orderkey % 31 = 0
        |ORDER BY o_orderkey, slot""".stripMargin)
  }

  def entries: Seq[CatalogEntry] =
    Seq(scalarUdf, typedUdaf, udtfGenerator, typedDataset, sqlFunction)
}
