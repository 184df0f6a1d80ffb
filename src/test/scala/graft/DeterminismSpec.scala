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
      // −0.0 tripwire (VERDICT r10 fix #2): Spark and DuckDB disagree on
      // the sign of a rounded zero (HALF_UP normalizes, DuckDB keeps the
      // sign bit) — numerically equal values then hash-mismatch in the
      // driver compare. Any declared output emitting a literal -0.0 must
      // go through Util.znorm (+ 0.0 on the oracle side). Token-exact
      // match on the collected row text — "-0.05" must not trip it.
      // Split on every non-numeric character (not just row brackets/commas)
      // so a -0.0 nested inside an array/struct rendering — e.g.
      // "ArraySeq(-0.0" — is still isolated into its own token.
      val negZero = first.iterator.flatMap(_.split("[^0-9.Ee+\\-]+")).contains("-0.0")
      assert(!negZero,
        s"${entry.key} emits -0.0 — wrap the rounded output in Util.znorm " +
          "and append + 0.0 to the oracle column")
    }
  }
}
