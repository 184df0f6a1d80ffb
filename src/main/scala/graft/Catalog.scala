package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator of the engine's surface (SURVEY.md §2 inventory).
  *
  * @param key       stable name; becomes the `SparkEntry.queries` map key
  * @param duckdbSql DuckDB SQL the driver's oracle runs on the same tables
  *                  (None for non-SQL-expressible / sketch-based entries —
  *                  those get a weaker rows-only check)
  * @param sparkSql  Spark-SQL-dialect twin of `duckdbSql`, used by the
  *                  in-repo self-check harness; equal to `duckdbSql` wherever
  *                  the dialects agree, a translated spelling otherwise
  * @param run       the Spark-first implementation over the tables at sfDir
  */
final case class CatalogEntry(
    key: String,
    duckdbSql: Option[String],
    sparkSql: Option[String],
    run: (SparkSession, String) => DataFrame)

object CatalogEntry {
  /** Entry whose oracle SQL parses identically in DuckDB and Spark. */
  def ansi(key: String, sql: String)(run: (SparkSession, String) => DataFrame): CatalogEntry =
    CatalogEntry(key, Some(sql), Some(sql), run)

  /** Entry needing a DuckDB-specific spelling + a Spark-SQL twin for tests. */
  def dialect(key: String, duckdb: String, spark: String)(
      run: (SparkSession, String) => DataFrame): CatalogEntry =
    CatalogEntry(key, Some(duckdb), Some(spark), run)

  /** No-oracle entry (BENCH + property tests only). */
  def noOracle(key: String)(run: (SparkSession, String) => DataFrame): CatalogEntry =
    CatalogEntry(key, None, None, run)

  /** Entry whose oracle is expressible in DuckDB SQL but NOT in Spark SQL
    * (e.g. recursive fixpoints — Spark 4.1 rejects UNION-distinct inside
    * recursive CTEs, and UNION ALL closure diverges on cyclic graphs).
    * The driver still gets the full DuckDB hash-compare; the in-repo
    * equivalence check lives in a dedicated spec (exempted, with
    * justification, from SelfCheckSpec's twin-coverage test). */
  def duckdbOnly(key: String, duckdb: String)(
      run: (SparkSession, String) => DataFrame): CatalogEntry =
    CatalogEntry(key, Some(duckdb), None, run)
}

/** The full operator catalog. Categories mirror SURVEY.md §2.1 A–L. */
object Catalog {
  lazy val all: Seq[CatalogEntry] =
    graft.queries.ScanQueries.entries ++
    graft.queries.ScalarQueries.entries ++
    graft.queries.JoinQueries.entries ++
    graft.queries.AggQueries.entries ++
    graft.queries.WindowQueries.entries ++
    graft.queries.SetSortQueries.entries ++
    graft.queries.SubqueryQueries.entries ++
    graft.queries.EtlQueries.entries ++
    graft.queries.TextQueries.entries ++
    graft.queries.VectorQueries.entries ++
    graft.queries.StreamQueries.entries ++
    graft.queries.UdfQueries.entries ++
    graft.queries.MultimodalQueries.entries ++
    graft.queries.GraphQueries.entries

  lazy val byKey: Map[String, CatalogEntry] = {
    val m = all.map(e => e.key -> e).toMap
    require(m.size == all.size, "duplicate catalog keys")
    m
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.key -> e.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(e => e.duckdbSql.map(e.key -> _)).toMap
}
