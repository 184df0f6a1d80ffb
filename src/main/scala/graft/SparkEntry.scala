package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual operator surface lives in [[Catalog]] (SURVEY.md §2 inventory);
  * this object is only the driver-facing adapter.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Bound to the TPC-H-Q1-shaped pricing summary (SURVEY §7.1 step 1): scan
    * → pushed filter → decimal projection → partial/final hash agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
