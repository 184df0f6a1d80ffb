package graft

/** SURVEY §5.3.6 strengthened: results must be invariant to the physical
  * partitioning knobs — the property that makes sf0.01 correctness
  * transfer to a 1000-executor cluster. Each sampled query runs in a
  * sibling session with spark.sql.shuffle.partitions=7 (vs the base 4)
  * and must produce byte-identical output.
  */
class PerturbationSpec extends SparkSpecBase {

  // every catalog entry — partition-count invariance is the property that
  // makes sf-scale correctness transfer to a 1000-executor cluster
  private val sample = Catalog.all.map(_.key)

  private lazy val perturbed = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "7")
    s
  }

  for (key <- sample) {
    test(s"partition-invariant: $key") {
      val base = rowsOf(Catalog.byKey(key).run(spark, sfDir))
      val alt = rowsOf(Catalog.byKey(key).run(perturbed, sfDir))
      assert(base == alt, s"$key differs under shuffle.partitions=7")
    }
  }
}
