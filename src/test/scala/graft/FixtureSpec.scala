package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §5.3.2 — tiny literal fixtures driving the edge paths the
  * corpus can't: explicit nulls, single-row partitions, exact ties,
  * empty inputs. Golden expectations inline. */
class FixtureSpec extends SparkSpecBase {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val kv = StructType(Seq(
    StructField("k", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  test("decimal sum ignores nulls and keeps exact scale") {
    val d = df(kv, Row("a", 1.15), Row("a", null), Row("b", 2.25), Row(null, 3.0))
    val got = d.groupBy(col("k"))
      .agg(sum(col("v").cast("decimal(18,4)")).cast("decimal(18,4)").as("s"))
      .orderBy(col("k").asc_nulls_first)
      .collect().map(r => (r.getString(0), Option(r.getDecimal(1)).map(_.toPlainString).orNull))
    assert(got.toSeq == Seq((null, "3.0000"), ("a", "1.1500"), ("b", "2.2500")))
  }

  test("lag over a single-row partition yields the default") {
    val d = df(kv, Row("solo", 5.0), Row("duo", 1.0), Row("duo", 2.0))
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
    val got = d.withColumn("prev", lag(col("v"), 1, -1.0).over(w))
      .orderBy(col("k"), col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("duo", 1.0, -1.0), ("duo", 2.0, 1.0), ("solo", 5.0, -1.0)))
  }

  test("row_number tie-break makes keep-latest deterministic under equal ts") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("ts", TimestampType),
      StructField("id", LongType)))
    val d = df(schema, Row("u", ts, 1L), Row("u", ts, 2L), Row("u", ts, 3L))
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc, col("id").desc)
    val got = d.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(3L)) // highest id wins the tie, always
  }

  test("rollup emits the null-keyed total row exactly once") {
    val d = df(kv, Row("a", 1.0), Row("b", 2.0))
    val got = d.rollup(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k").asc_nulls_first)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq((null, 2L), ("a", 1L), ("b", 1L)))
  }

  test("full outer join null-extends both unmatched sides") {
    val l = df(kv, Row("a", 1.0), Row("b", 2.0))
    val r = df(kv, Row("b", 20.0), Row("c", 30.0))
      .select(col("k").as("k2"), col("v").as("v2"))
    val got = l.join(r, col("k") === col("k2"), "full")
      .select(coalesce(col("k"), col("k2")).as("key"), col("v"), col("v2"))
      .orderBy("key")
      .collect().map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2))))
    assert(got.toSeq == Seq(
      ("a", Some(1.0), None), ("b", Some(2.0), Some(20.0)), ("c", None, Some(30.0))))
  }

  test("aggregations over an empty frame return no rows, not nulls") {
    val empty = df(kv)
    assert(empty.groupBy(col("k")).agg(sum(col("v"))).count() == 0)
    // but a global aggregate over empty input yields one null row
    val row = empty.agg(sum(col("v")).as("s")).collect().head
    assert(row.isNullAt(0))
  }

  test("null-safe equality treats null = null as true only under <=>") {
    val d = df(kv, Row(null, 1.0), Row("x", 2.0))
    assert(d.where(col("k") === lit(null).cast("string")).count() == 0)
    assert(d.where(col("k") <=> lit(null).cast("string")).count() == 1)
  }

  test("array ops on empty token lists are total (no exceptions)") {
    val s = StructType(Seq(StructField("text", StringType)))
    val d = df(s, Row(""), Row("a b"))
      .withColumn("toks", array_distinct(split(col("text"), " ")))
    val got = d.select(size(col("toks"))).collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(1, 2)) // "" splits to [""], not []
  }
}
