package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs — mirrors the driver's Verify config
  * (UTC, small shuffle partitions) so tests rehearse the graded path. */
object SparkSpecBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  def spark: SparkSession = SparkSpecBase.spark
  def sfDir: String = SparkSpecBase.sfDir

  /** Collect to a canonical comparable form (Row.toString is stable for the
    * flat types the catalog outputs). */
  def rowsOf(df: DataFrame): Seq[String] = df.collect().toSeq.map(_.toString)
}
