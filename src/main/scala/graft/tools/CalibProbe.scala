package graft.tools

/** 2-second host-state probe: prints the same single-thread calibration
  * constant Bench/ScaleProof embed, without starting a SparkSession.
  * Measurement legs are only worth launching when this reads ~0.10-0.15
  * on this box (BASELINE.md methodology: cross-boot host steal swings
  * the constant 0.10 → 0.64, and no normalization rescues a 100×-leg
  * absolute taken at 0.6). Run before any ScaleProof/BenchGrid session.
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      var acc = 0L; var i = 0L
      while (i < 200000000L) { acc += i * i; i += 1 }
      if (acc == 42L) println("")
      println(f"[calib] rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
