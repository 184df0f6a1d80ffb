package graft.queries

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.functions._
import Util._

/** Category D — aggregation (SURVEY.md §2.1.D).
  *
  * Scale notes: all group-bys here are low-cardinality keys over the fact
  * tables, i.e. the textbook partial-agg (map-side combine) → shuffle →
  * final-agg shape. At 100 TB the shuffle carries only |groups| × partitions
  * rows, so these stay cheap regardless of input size.
  */
object AggQueries {

  /** Flagship: TPC-H-Q1-shaped pricing summary (also SparkEntry.entry). */
  val pricingSummary: CatalogEntry = CatalogEntry.ansi(
    "agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_base_price,
      |       CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))), 4) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_disc_price,
      |       CAST(SUM(CAST(ROUND(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))), 4) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_charge,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, sfDir) =>
    val one = lit(1).cast(DecT)
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .withColumn("qty",   dec(col("l_quantity")))
      .withColumn("price", dec(col("l_extendedprice")))
      .withColumn("disc",  dec(col("l_discount")))
      .withColumn("tax",   dec(col("l_tax")))
      .withColumn("disc_price", dec(col("price") * (one - col("disc"))))
      .withColumn("charge",     dec(col("disc_price") * (one + col("tax"))))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decOut(sum(col("qty"))).as("sum_qty"),
        decOut(sum(col("price"))).as("sum_base_price"),
        decOut(sum(col("disc_price"))).as("sum_disc_price"),
        decOut(sum(col("charge"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def entries: Seq[CatalogEntry] = Seq(pricingSummary)
}
