package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable table sources (SURVEY.md §2.1.A `src_jdbc_surface`).
  *
  * The engine's ETL surface reads staging data from files or a JDBC
  * warehouse (Redshift-style) and is agnostic to which — every operator
  * consumes a DataFrame. At 100 TB the file paths are the hot ones
  * (columnar, splittable, predicate-pushdown); the JDBC path exists for
  * dimension syncs and writebacks and must always be partitioned
  * (`partitionColumn`) so the read fans out across executors instead of
  * serializing through one connection.
  */
sealed trait TableSource {
  def load(spark: SparkSession): DataFrame
}

final case class ParquetSource(path: String) extends TableSource {
  def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** CSV with an explicit schema — never inferred (inference re-reads the
  * data and drifts types; a 100-TB staging load cannot afford either). */
final case class CsvSource(path: String, schema: StructType, header: Boolean = true)
    extends TableSource {
  def load(spark: SparkSession): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)
}

final case class JsonSource(path: String, schema: StructType) extends TableSource {
  def load(spark: SparkSession): DataFrame =
    spark.read.schema(schema).json(path)
}

/** Line-oriented text — the rawest ingestion format (log shipping, corpus
  * dumps): one row per line, single `value` string column. Schema-free by
  * nature, so unlike the other sources there is nothing to enforce. */
final case class TextSource(path: String) extends TableSource {
  def load(spark: SparkSession): DataFrame = spark.read.text(path)
}

/** JDBC source for warehouse interop (Redshift et al.).
  *
  * Executed for real against an embedded Derby database (the JDBC engine
  * that ships with the Spark distribution): the `src_jdbc_surface` catalog
  * entry round-trips `nation` through Derby with a partitioned read, and
  * ScanSpec exercises partitioned-read fan-out + append semantics. The
  * option plumbing is the standard Spark JDBC surface:
  *   - `dbtable` may be a table name or a pushed-down subquery alias
  *   - when `partitionColumn` is set, Spark issues `numPartitions` range
  *     queries in parallel — the only scalable way to bulk-read over JDBC
  */
final case class JdbcSource(
    url: String,
    dbtable: String,
    user: String,
    password: String,
    driver: String = "",
    partitionColumn: Option[String] = None,
    lowerBound: Long = 0L,
    upperBound: Long = 0L,
    numPartitions: Int = 8) extends TableSource {
  def load(spark: SparkSession): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("user", user)
      .option("password", password)
    if (driver.nonEmpty) r = r.option("driver", driver)
    partitionColumn.foreach { pc =>
      r = r.option("partitionColumn", pc)
        .option("lowerBound", lowerBound.toString)
        .option("upperBound", upperBound.toString)
        .option("numPartitions", numPartitions.toString)
    }
    r.load()
  }

  /** Append a DataFrame back to the warehouse (ETL write-back path).
    * Creates the table on first use, per Spark JDBC SaveMode.Append. */
  def append(df: DataFrame): Unit = write(df, "append")

  /** Drop-and-recreate write (full-refresh staging path). */
  def overwrite(df: DataFrame): Unit = write(df, "overwrite")

  private def write(df: DataFrame, mode: String): Unit = {
    var w = df.write.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("user", user).option("password", password)
    if (driver.nonEmpty) w = w.option("driver", driver)
    w.mode(mode).save()
  }
}
