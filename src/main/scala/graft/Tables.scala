package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders for the star-schema test corpus (SURVEY.md §1, FIXTURES.md).
  *
  * All inputs are parquet at `\$sfDir/<name>.parquet`. Parquet carries its own
  * schema, so no inference drift is possible; the vectorized columnar reader
  * plus Catalyst pushdown/pruning make these scans 100-TB-shaped by
  * construction — filters and projections land in the scan node.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped in two parquet spellings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark cannot read as a timestamp
    * at all — inference and explicit schema both fail) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (a plain TIMESTAMP_NTZ read). Sniff which one
    * this file is from the inferred schema under `nanosAsLong`: a nanos file
    * surfaces `ts` as LongType (rebuild it by truncating to µs — bit-identical
    * to how DuckDB reads the same column), a µs file surfaces TIMESTAMP_NTZ
    * (take it as-is; DuckDB reads the very same µs values).
    *
    * Either way the column the engine sees is TIMESTAMP_NTZ (round-2 fix,
    * VERDICT.md r1 #2): session-tz TimestampType writes parquet as
    * isAdjustedToUTC=true, which DuckDB's naive TIMESTAMP schema-mismatches.
    * Building from the NTZ epoch via timestampadd is timezone-independent by
    * construction, so every derived timestamp (window bounds, date_trunc,
    * lag) stays naive end-to-end and matches DuckDB's reading.
    */
  /** Memoized relation per (session, sfDir, table) — fixed-overhead
    * control (VERDICT r12 #3). Every catalog entry used to rebuild its
    * source DataFrames from `spark.read.parquet`, re-paying file listing,
    * footer schema read, and analysis for the SAME immutable input on
    * every invocation; across the 274-entry bench that re-planning is
    * pure per-action floor. DataFrames are immutable and reusable across
    * queries within a session, so handing every caller the same analyzed
    * relation changes no semantics (the testdata dirs never mutate
    * mid-session). `graft.tables.memo=false` restores the old behavior
    * (the A/B lever FloorProbe uses). Stopped sessions are evicted on
    * lookup, same pattern as the other driver-side memos. */
  private val loadCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (spark.conf.get("graft.tables.memo", "true").toBoolean) {
      loadCache.keySet.removeIf(_._1.sparkContext.isStopped)
      // Stopped-context eviction alone is not enough in a long-lived JVM
      // that churns spark.newSession() children off ONE context (tests,
      // servers): those sessions never stop a context, so their entries
      // would accumulate unboundedly. The memo is a pure perf cache, so a
      // size bound with full reset is the simplest safe policy — a clear
      // costs one re-listing per live (session, sfDir, table), nothing else.
      if (loadCache.size > 512) loadCache.clear()
      loadCache.computeIfAbsent((spark, sfDir, name),
        _ => doLoad(spark, sfDir, name))
    } else doLoad(spark, sfDir, name)

  private def doLoad(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) read as raw nanos: truncate to µs
          raw.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
        case TimestampNTZType => raw // TIMESTAMP(MICROS) NTZ: what the engine wants
        case other => // e.g. session-tz TimestampType from isAdjustedToUTC=true —
          // would silently offset every derived timestamp vs DuckDB; fail fast.
          throw new IllegalStateException(
            s"events.ts read as $other; expected raw NANOS (LongType under " +
              "nanosAsLong) or TIMESTAMP_NTZ. Regenerate the fixture with " +
              "isAdjustedToUTC=false (naive µs) — see Tables.scala scaladoc.")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view (for spark.sql-based operators). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
