package graft.queries

import graft.{CatalogEntry, Tables}
import graft.sources.{CsvSource, ParquetSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Category A — scans, sources, sinks (SURVEY.md §2.1.A).
  *
  * Scale notes: projection + filter must reach the parquet scan
  * (PushedFilters / ReadSchema — asserted in PlanShapeSpec). At 100 TB that
  * is the difference between reading 2 columns of a few row groups and
  * reading everything.
  */
object ScanQueries {

  private val scanProject = CatalogEntry.ansi(
    "src_scan_project",
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, sfDir) =>
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Explicit-schema read + cast/rename — the COPY column-mapping analog. */
  private val schemaEnforce = CatalogEntry.ansi(
    "src_schema_enforce",
    """SELECT event_id AS id, CAST(user_id AS INTEGER) AS uid,
      |       event_type AS etype, CAST(value AS DECIMAL(18,4)) AS val_dec
      |FROM events ORDER BY id""".stripMargin) { (spark, sfDir) =>
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.read.schema(schema).parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id").as("id"),
        col("user_id").cast("int").as("uid"),
        col("event_type").as("etype"),
        dec(col("value")).as("val_dec"))
      .orderBy(col("id"))
  }

  /** JSON-in-string extraction (COPY FORMAT JSON / json_extract_path_text). */
  private val jsonExtract = CatalogEntry.dialect(
    "src_json_extract",
    duckdb = """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
               |FROM events ORDER BY event_id""".stripMargin,
    spark = """SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k_val
              |FROM events ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy(col("event_id"))
  }

  /** CSV write→read fidelity (COPY-in / UNLOAD-out): result must equal source. */
  private val csvRoundtrip = CatalogEntry.ansi(
    "src_csv_roundtrip",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") {
    (spark, sfDir) =>
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv_roundtrip"
      Tables.nation(spark, sfDir)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      CsvSource(tmp, schema).load(spark).orderBy(col("n_nationkey"))
  }

  /** Partitioned parquet sink + readback (UNLOAD PARTITION analog).
    * Partition-by-year is the 100-TB layout move: year predicates become
    * directory pruning instead of data reads. */
  private val partitionedWrite = CatalogEntry.ansi(
    "sink_partitioned_write",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, sfDir) =>
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_partitioned_sink"
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    ParquetSource(tmp).load(spark)
      .groupBy(col("o_year").cast("int").as("o_year"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_year"))
  }

  /** JDBC surface exemplar — no live database in this environment, so the
    * entry exercises the TableSource trait through its parquet
    * implementation; JdbcSource holds the real warehouse plumbing. */
  private val jdbcSurface = CatalogEntry.noOracle("src_jdbc_surface") { (spark, sfDir) =>
    ParquetSource(s"$sfDir/nation.parquet").load(spark).orderBy(col("n_nationkey"))
  }

  def entries: Seq[CatalogEntry] = Seq(
    scanProject, schemaEnforce, jsonExtract, csvRoundtrip, partitionedWrite, jdbcSurface)
}
