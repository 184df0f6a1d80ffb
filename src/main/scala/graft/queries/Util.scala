package graft.queries

import org.apache.spark.sql.Column

/** Shared determinism helpers (SURVEY.md §2.0). */
object Util {
  /** The canonical exact numeric type for money/measure aggregation.
    * All source measures are DOUBLE; decimal addition is exact and
    * associative in both Spark and DuckDB, so every SUM/AVG that feeds a
    * hash-compared output goes through this cast (§2.0.3).
    */
  val DecT = "decimal(18,4)"

  def dec(c: Column): Column = c.cast(DecT)

  /** Final-output pin: Spark widens SUM(DECIMAL(18,4)) to (28,4), DuckDB to
    * (38,4) — re-cast every aggregated output to (18,4) on BOTH sides so the
    * written schemas agree.
    */
  def decOut(c: Column): Column = c.cast(DecT)
}
