package graft

import org.apache.spark.sql.DataFrame

/** SURVEY §5.3.1 — the self-check oracle harness.
  *
  * For every catalog entry that declares a Spark-SQL twin of its oracle,
  * run BOTH the DataFrame implementation and the SQL twin in Spark over the
  * same tables and diff the collected rows. This catches logic mismatches
  * between implementation and declared semantics; Spark↔DuckDB dialect
  * drift is covered by tools/check.py (the t2 rehearsal).
  */
class SelfCheckSpec extends SparkSpecBase {

  private lazy val registered: Unit = Tables.registerAll(spark, sfDir)

  for (entry <- Catalog.all; sql <- entry.sparkSql) {
    test(s"self-check: ${entry.key}") {
      registered
      val impl: DataFrame = entry.run(spark, sfDir)
      val twin: DataFrame = spark.sql(sql)
      assert(impl.columns.toSeq == twin.columns.toSeq,
        s"column names differ for ${entry.key}")
      val implRows = rowsOf(impl)
      val twinRows = rowsOf(twin)
      assert(implRows.size == twinRows.size,
        s"row counts differ for ${entry.key}: ${implRows.size} vs ${twinRows.size}")
      implRows.zip(twinRows).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"${entry.key} row $i differs:\n  impl: $a\n  twin: $b")
      }
    }
  }

  test("every oracle-checked entry has a spark twin (harness coverage)") {
    val missing = Catalog.all.filter(e => e.duckdbSql.isDefined && e.sparkSql.isEmpty)
    assert(missing.isEmpty, s"entries lacking a self-check twin: ${missing.map(_.key)}")
  }

  test("flagship entry returns rows (t1 smoke rehearsal)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
