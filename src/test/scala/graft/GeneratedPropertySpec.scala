package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** SURVEY §5.3.3 — scalacheck generators driving the operator invariants
  * over arbitrary (not corpus-shaped) data. Generated frames are tiny on
  * purpose: the properties are algebraic, not volumetric. */
class GeneratedPropertySpec extends SparkSpecBase {

  /** Run a scalacheck property under a small trial budget (each trial
    * executes several Spark jobs) and surface its result to ScalaTest. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }


  private val keyedRow: Gen[(String, Long, Double)] = for {
    k <- Gen.oneOf("a", "b", "c", "d")
    id <- Gen.choose(0L, 50L)
    v <- Gen.choose(-1000.0, 1000.0)
  } yield (k, id, v)

  private val frameGen: Gen[List[(String, Long, Double)]] =
    Gen.listOfN(40, keyedRow)

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("id", LongType),
    StructField("v", DoubleType)))

  private def toDf(rows: List[(String, Long, Double)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3),
      schema)

  test("keep-latest dedup is idempotent on generated data") {
    check(forAll(frameGen) { rows =>
      val w = Window.partitionBy(col("k")).orderBy(col("id").desc, col("v").desc)
      def latest(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
      val once = latest(toDf(rows)).orderBy("k").collect().toSeq
      val twice = latest(latest(toDf(rows))).orderBy("k").collect().toSeq
      Prop(once == twice)
    })
  }

  test("distinct is idempotent and bounded by input size") {
    check(forAll(frameGen) { rows =>
      val df = toDf(rows)
      val d1 = df.distinct()
      Prop(d1.count() == d1.distinct().count() && d1.count() <= rows.size)
    })
  }

  test("decimal group sums are partition-invariant on generated data") {
    check(forAll(frameGen) { rows =>
      def sums(parts: Int) = toDf(rows).repartition(parts)
        .groupBy(col("k"))
        .agg(sum(col("v").cast("decimal(18,4)")).cast("decimal(18,4)").as("s"))
        .orderBy("k").collect().toSeq.map(_.toString)
      Prop(sums(2) == sums(5))
    })
  }

  test("FK-style join against the distinct key dim preserves cardinality") {
    check(forAll(frameGen) { rows =>
      val df = toDf(rows)
      val dim = df.select(col("k").as("dk")).distinct()
      Prop(df.join(dim, col("k") === col("dk")).count() == rows.size)
    })
  }

  test("set algebra on generated frames: A∪A(distinct)=A, A∖A=∅, A∩A=A") {
    check(forAll(frameGen) { rows =>
      val a = toDf(rows).select("k", "id").distinct()
      val n = a.count()
      Prop(a.union(a).distinct().count() == n
        && a.except(a).count() == 0
        && a.intersect(a).count() == n)
    })
  }

  test("running sum's final row equals the group total on generated data") {
    check(forAll(frameGen) { rows =>
      val w = Window.partitionBy(col("k")).orderBy(col("id"), col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val df = toDf(rows).withColumn("dv", col("v").cast("decimal(18,4)"))
      val finals = df.withColumn("rs", sum(col("dv")).over(w))
        .groupBy(col("k")).agg(max(struct(col("id"), col("v"), col("rs"))).as("last"))
        .select(col("k"), col("last.rs").cast("decimal(18,4)").as("rs"))
      val direct = df.groupBy(col("k"))
        .agg(sum(col("dv")).cast("decimal(18,4)").as("total"))
      val joined = finals.join(direct, "k")
        .where(col("rs") =!= col("total"))
      Prop(joined.count() == 0)
    })
  }
}
