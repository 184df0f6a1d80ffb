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
      // go through Util.znorm (+ 0.0 on the oracle side). Whole-value
      // match on the collected row text — "-0.05" must not trip it, and
      // (ADVICE r12) neither must a STRING value that merely CONTAINS the
      // substring "-0.0" (e.g. "v-0.0x"): the match must be delimited by
      // row/array/struct punctuation or string boundaries on both sides,
      // so only a rendered numeric -0.0 fires — including one nested in
      // an array/struct rendering like "ArraySeq(-0.0,".
      val negZeroRe = java.util.regex.Pattern.compile(
        "(^|[\\[,(\\s])-0\\.0([\\],)\\s]|$)")
      val negZero = first.exists(s => negZeroRe.matcher(s).find())
      assert(!negZero,
        s"${entry.key} emits -0.0 — wrap the rounded output in Util.znorm " +
          "and append + 0.0 to the oracle column")
    }
  }
}
