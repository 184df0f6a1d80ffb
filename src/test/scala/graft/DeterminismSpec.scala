package graft

/** SURVEY §5.3.6 — the determinism harness: every declared query, run
  * twice, must produce identical collected output. This directly rehearses
  * the driver's hash compare (which is bit-level on the written parquet).
  * Streaming/sink entries are exercised too — their tmp-dir sinks are
  * overwrite-idempotent by construction.
  */
class DeterminismSpec extends SparkSpecBase {

  private val skip = Set.empty[String]

  for (entry <- Catalog.all if !skip(entry.key)) {
    test(s"deterministic: ${entry.key}") {
      val first = rowsOf(entry.run(spark, sfDir))
      val second = rowsOf(entry.run(spark, sfDir))
      assert(first == second, s"${entry.key} differs across runs")
    }
  }
}
