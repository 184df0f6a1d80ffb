package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-layer behaviors beyond the oracle compare. */
class ScanSpec extends SparkSpecBase {

  test("permissive CSV load quarantines malformed rows without failing") {
    // run the entry once so the staged dir (with the corrupt part-file)
    // exists and the clean output is materialized
    val clean = Catalog.byKey("src_csv_badrecords").run(spark, sfDir)
    assert(clean.count() == Tables.nation(spark, sfDir).count())
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv_badrecords"
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType),
      StructField("_corrupt", StringType)))
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(tmp)
      .cache() // documented workaround: corrupt-column-only plans are rejected
    try {
      val quarantined = parsed.where(col("_corrupt").isNotNull).collect()
      assert(quarantined.length == 2, "expected both malformed lines quarantined")
      assert(quarantined.forall(_.isNullAt(0)), "quarantined rows must not parse a key")
    } finally parsed.unpersist()
  }

  test("FAILFAST mode rejects the malformed batch outright") {
    Catalog.byKey("src_csv_badrecords").run(spark, sfDir).count()
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv_badrecords"
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val thrown = intercept[Exception] {
      spark.read.schema(schema).option("mode", "FAILFAST").csv(tmp).collect()
    }
    assert(thrown.getMessage != null)
  }
}
