package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import scala.collection.concurrent.TrieMap

/** The structural cliff canary (VERDICT r17 #1): every banded/blocked
  * catalog entry (`Catalog.bandedKeys`) runs against the clique-heavy
  * [[CliqueFixture]] at two clone depths, and the growth of the largest
  * single plan-node row mass is bounded.
  *
  * Why this catches the class: all seven 100×-only cliffs materialized
  * their quadratic intermediate as some operator's output rows (joined
  * candidate pairs, a global DISTINCT, a fraction-cut cross product) —
  * candidates must flow to a verify/rank stage, so the mass is visible in
  * the "number of output rows" metric. The fixture doubles `reps` (exact
  * clones per near-dup variant) while holding the distinct-value
  * population constant: value-level machinery (the DistinctValue
  * helpers) grows intermediates linearly with the scan, while a
  * reintroduced doc-level pairing grows them ~4× — the canary asserts
  * growth ≤ max(3.0, 1.6 × output growth).
  *
  * The output-growth escape hatch covers the pair-output contract
  * entries (dedup_simhash, dedup_exact_substring, ...): on a clone-heavy
  * corpus their OUTPUT is quadratic in clique depth by spec, so
  * intermediates legitimately track it; the asymptotic guard protects
  * the linear-output scale paths, which are the 100-TB consumers.
  *
  * Accumulator totals are collected task-level (a SparkListener), so
  * eager sub-executions inside entries (checkpointed fixpoints, probe
  * counts, cache materializations) are all counted — nothing hides in a
  * side action.
  */
class CliffCanarySpec extends SparkSpecBase {

  /** Sums each "number of output rows" SQLMetric accumulator across task
    * completions; max over accumulators = the largest single node's rows. */
  private class RowMassListener extends SparkListener {
    private val totals = TrieMap[Long, Long]()
    @volatile var enabled = false
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      // successful tasks only (ADVICE r18): a failed/retried task reports
      // the same accumulator updates as its successful re-run, so counting
      // it double-counts row mass and can push the growth ratio past the
      // bound on a transient retry — flaky, and one-sided (only inflates)
      if (enabled && e.taskInfo != null && e.taskInfo.successful)
        e.taskInfo.accumulables.foreach { a =>
        if (a.name.contains("number of output rows")) a.update.foreach { u =>
          val v = u match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case s: String => s.replace(",", "").toLong
            case _ => 0L
          }
          totals.updateWith(a.id) { prev => Some(prev.getOrElse(0L) + v) }
        }
      }
    def maxNode: Long = if (totals.isEmpty) 0L else totals.values.max
    def reset(): Unit = totals.clear()
  }

  private val listener = new RowMassListener
  private lazy val fixtures: (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("cliquefix").toString
    // 12 cliques x 5 near-dup variants; depth 40 -> 80 by doubling the
    // exact-clone count (distinct-value population CONSTANT across sizes)
    CliqueFixture.build(spark, s"$root/d1", cliques = 12, variants = 5, reps = 8)
    CliqueFixture.build(spark, s"$root/d2", cliques = 12, variants = 5, reps = 16)
    spark.sparkContext.addSparkListener(listener)
    (s"$root/d1", s"$root/d2")
  }

  /** Run the entry, wait for the listener bus to drain, return
    * (output rows, max single-node row mass). */
  private def measure(key: String, dir: String): (Long, Long) = {
    graft.queries.Util.sweepEntryCaches(spark)
    listener.reset(); listener.enabled = true
    // toRdd.count(), NOT count(): Catalyst rewrites a count() into a new
    // aggregate-only query in which column pruning AND join elimination
    // can remove entire subtrees (measured: the pre-r18 interval_overlap
    // pair join — 2060 rows on the d1 fixture — vanished from the
    // executed count() plan because its left join carried unique grouped
    // keys and no projected column survived pruning). toRdd executes the
    // entry's own physical plan in full, so no quadratic subtree can hide
    // from the canary behind the harness action.
    val out = Catalog.byKey(key).run(spark, dir).queryExecution.toRdd.count()
    // listener delivery is async: poll until the max is stable
    var last = -1L; var cur = listener.maxNode; var spins = 0
    while (cur != last && spins < 40) {
      Thread.sleep(50); last = cur; cur = listener.maxNode; spins += 1
    }
    listener.enabled = false
    graft.queries.Util.sweepEntryCaches(spark)
    (out, cur)
  }

  /** Total input rows across the fixture dir's tables — the "scan rows"
    * term of the absolute mass bound (computed once per dir). */
  private val scanRowsCache = TrieMap[String, Long]()
  private def scanRows(dir: String): Long = scanRowsCache.getOrElseUpdate(dir,
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => spark.read.parquet(f.getAbsolutePath).count()).sum)

  /** Absolute mass-bound constant (VERDICT r18 #3: the growth-ratio check
    * alone exempts pair-output entries, so an entry whose OUTPUT grows
    * quadratically AND whose intermediates grow worse-than-output would
    * pass). Largest node rows must stay ≤ C·(scan rows + output rows) at
    * BOTH depths. C is documented from the catalog's measured masses on
    * the fixtures (r19 calibration run, all 18 banded entries, ratios
    * m/(scan+out) at both depths): the widest legitimate intermediates
    * are vec_lsh_ann 7.0 (SRP band × probe fan-out against a 10-row
    * output), dedup_cluster_lsh 4.3, dedup_exact_substring 3.4,
    * dedup_ngram_lsh 2.0 — every other banded entry sits below 2.2, and
    * every ratio is depth-INVARIANT (the per-row fan-out is fixed by the
    * algorithm: hashes × bands, chunks per doc — not data-dependent).
    * C = 32 gives the widest legitimate entry ~4.5× headroom while
    * failing the quadratic regime the hatch could hide: a doc-level
    * all-pairs intermediate inside a pair-output entry reads
    * ~m·C(reps,2)/(scan+out) ≈ 29× at reps=16 on this fixture and
    * QUADRUPLES by the next doubling — past 32 at the tested depths,
    * and diverging while legitimate ratios stay flat. */
  private val massBoundC = 32L

  for (key <- Catalog.bandedKeys.toSeq.sorted) {
    test(s"$key: intermediate row mass grows sub-quadratically with clone depth") {
      val (d1, d2) = fixtures
      val (out1, m1) = measure(key, d1)
      val (out2, m2) = measure(key, d2)
      val (in1, in2) = (scanRows(d1), scanRows(d2))
      info(f"$key: out $out1%d -> $out2%d, maxNode $m1%d -> $m2%d, " +
        f"mass/(scan+out) ${m1.toDouble / (in1 + out1)}%.2f -> ${m2.toDouble / (in2 + out2)}%.2f")
      assert(m1 > 0, s"$key produced no row-mass metric on the fixture")
      val outGrowth = out2.toDouble / math.max(out1, 1L)
      val growth = m2.toDouble / math.max(m1, 1L)
      val bound = math.max(3.0, 1.6 * outGrowth)
      assert(growth <= bound,
        f"$key: max node row mass grew $growth%.2fx when clone depth doubled " +
          f"(output grew $outGrowth%.2fx, bound $bound%.2f) — a doc-level " +
          "pairing has crept back in; pre-aggregate to DISTINCT values " +
          "(graft.queries.DistinctValue) before the banded/blocked join")
      // absolute bound closes the output-growth escape hatch: intermediates
      // may not exceed C×(what the entry reads + what it emits) even when
      // the output itself grows quadratically (pair-output contract entries)
      Seq((d1, m1, in1, out1), (d2, m2, in2, out2)).foreach { case (d, m, in, out) =>
        assert(m <= massBoundC * (in + out),
          f"$key on $d: max node row mass $m%d exceeds $massBoundC×(scan $in%d " +
            f"+ output $out%d) — an intermediate is growing worse than " +
            "scan+output; no banded entry may materialize more than the " +
            "fixed per-row fan-out of its banding scheme")
      }
    }
  }

  test("banded inventory covers every LSH/fingerprint-banding key") {
    // force new banded entries to register for the canary: any catalog
    // key in the candidate-pairing naming families must be listed
    val suspicious = Catalog.all.map(_.key).filter(k =>
      k.contains("lsh") || k.contains("simhash") || k.contains("phash") ||
        k.contains("hamming"))
    val missing = suspicious.filterNot(Catalog.bandedKeys)
    assert(missing.isEmpty,
      s"banded-pairing keys missing from Catalog.bandedKeys (the canary " +
        s"would not cover them): ${missing.mkString(", ")}")
  }

  test("scale-path routing resolves and is exposed by the catalog dump") {
    // stamped validates the map; the dump must surface every route
    val dump = graft.tools.CatalogDump.render()
    Catalog.scalePaths.foreach { case (k, twin) =>
      assert(dump.contains(s""""$k": {"oracle""""), s"$k missing from dump")
      assert(dump.contains(s""""scalePath": "$twin""""), s"$k route to $twin missing")
    }
    assert(Catalog.stamped.count(_.banded) == Catalog.bandedKeys.size)
  }
}
