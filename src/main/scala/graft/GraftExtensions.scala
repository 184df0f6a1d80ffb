package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Declarative session extensions — the spark-submit deployment route:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * installs the engine's SQL functions (native vector math, sorted-set
  * intersect, KLL and top-k sketches — see
  * [[graft.functions.GraftFunctionDefs]]) and the HOF-fusion optimizer
  * rule on EVERY session the cluster builds, before any query is planned.
  * [[GraftSession.install]] remains the imperative twin for sessions the
  * caller already owns (the test/driver harness path); both consume the
  * same definition list, so the two routes cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctionDefs.defs.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.VectorFusionRule)
  }
}
