package graft

import org.apache.spark.sql.SparkSession

/** The engine's session factory — one place for the configuration that
  * makes the catalog correct and scale-shaped, whether the caller is the
  * local harness (local[32]) or a production cluster (spark-submit sets
  * master/memory; the SQL knobs below still apply).
  *
  * Knobs and why:
  *  - shuffle.partitions: sized to cores locally; on a real cluster set
  *    ~2-3× total executor cores, or leave AQE coalescing to trim (it is
  *    on by default in Spark 4 and we keep it on).
  *  - session timezone UTC: the determinism contract (SURVEY §1.3) — all
  *    oracle comparisons assume it.
  *  - parquet TIMESTAMP_MICROS: int64 µs is the physical type every
  *    reader in the toolchain (DuckDB, pyarrow, Spark) maps 1:1.
  *  - files.maxPartitionBytes stays default (128 MB): right for the
  *    100 TB design point — ~800k input splits over 1000 executors; do
  *    NOT shrink it for small local files, AQE already coalesces tiny
  *    post-shuffle partitions.
  *
  * `install` wires in the engine's session-scoped extensions (native
  * vector functions + the HOF-fusion optimizer rule) — callable on ANY
  * session, including ones the harness built itself.
  */
object GraftSession {

  def build(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
            shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    install(s)
    s
  }

  /** Idempotently attach the engine's extensions to an existing session.
    * Declarative twin: `spark.sql.extensions=graft.GraftExtensions`
    * ([[GraftExtensions]]) for clusters where session construction isn't
    * ours — both paths read the same function-definition list. */
  def install(spark: SparkSession): Unit = {
    graft.functions.GraftFunctionDefs.ensureRegistered(spark)
    graft.plans.GraftPlans.ensureInstalled(spark)
  }
}
