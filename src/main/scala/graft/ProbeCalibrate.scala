package graft

/** One-command recalibration for the bench's host-profile probe constant
  * (VERDICT r17 #2): [[Bench.ProbeRefSecDefault]] is the quiet-box floor of
  * the calibration kernel measured on THIS sandbox — on any other hardware
  * the committed 0.41 s is meaningless, and without a committed tool a
  * hardware change turns recalibration into archaeology. This main re-runs
  * the exact committed protocol (documented in BASELINE.md, pinned by
  * [[BenchConstantsSpec]]) and prints the would-be reference:
  *
  *   1. JIT/OSR warm-up: two untimed kernel runs (a cold run measures C2
  *      tier-up, not the host).
  *   2. N timed samples (default 12, arg 1 or SPARK_GRAFT_PROBE_SAMPLES)
  *      of [[Bench.probeWork]] at the committed [[Bench.ProbeIters]], each
  *      with the 1-minute load alongside so a sample taken under load is
  *      visible in the record.
  *   3. The would-be `ProbeRefSec` is the MIN of the samples (the floor —
  *      same statistic [[Bench.calibrationProbe]] uses per pass), valid
  *      only if the box was quiet; the printed per-sample loads and the
  *      min/max band let a reader judge that.
  *
  * Output: one JSON line with the floor, the observed sample band, the
  * would-be hot threshold (floor × [[Bench.ProbeHotRatio]]), and the
  * committed reference for comparison. To adopt a new floor either export
  * SPARK_GRAFT_PROBE_REF for the run at hand or commit it as
  * `ProbeRefSecDefault` alongside a BASELINE.md update (the spec pins the
  * two to each other). No SparkSession — the kernel is single-thread CPU.
  */
object ProbeCalibrate {
  def main(args: Array[String]): Unit = {
    val samples = args.headOption.flatMap(_.toIntOption)
      .orElse(sys.env.get("SPARK_GRAFT_PROBE_SAMPLES").flatMap(_.toIntOption))
      .filter(_ > 0).getOrElse(12)
    System.err.println(s"[calibrate] warm-up (2 untimed kernel runs at ${Bench.ProbeIters} iters)")
    Bench.probeWork(Bench.ProbeIters); Bench.probeWork(Bench.ProbeIters)
    val readings = (1 to samples).map { i =>
      val load = Bench.loadAvg()
      val t0 = System.nanoTime()
      val acc = Bench.probeWork(Bench.ProbeIters)
      val dt = (System.nanoTime() - t0) / 1e9
      if (acc == 0L) System.err.print("") // consume acc; keep the data dependency
      System.err.println(f"[calibrate] sample $i%2d/$samples: $dt%.3f s (1-min load $load%.2f)")
      (dt, load)
    }
    val floor = readings.map(_._1).min
    val band = (readings.map(_._1).min, readings.map(_._1).max)
    val js = readings.map { case (dt, _) => Bench.fmt(dt, 3) }.mkString("[", ",", "]")
    val loads = readings.map { case (_, l) => Bench.fmt(l, 2) }.mkString("[", ",", "]")
    println(
      s"""{"metric":"probe_floor","value":${Bench.fmt(floor, 3)},"unit":"sec",""" +
      s""""samples":$samples,"probe_iters":${Bench.ProbeIters},""" +
      s""""band":[${Bench.fmt(band._1, 3)},${Bench.fmt(band._2, 3)}],""" +
      s""""would_be_hot_threshold":${Bench.fmt(floor * Bench.ProbeHotRatio, 3)},""" +
      s""""committed_ref":${Bench.ProbeRefSecDefault},""" +
      s""""ratio_vs_committed":${Bench.fmt(floor / Bench.ProbeRefSecDefault, 2)},""" +
      s""""readings":$js,"loads":$loads}""")
    if (floor > Bench.ProbeRefSecDefault * Bench.ProbeHotRatio)
      System.err.println(f"[calibrate] this box's quiet floor ($floor%.3f s) reads HOT against " +
        s"the committed reference (${Bench.ProbeRefSecDefault}) — a bench here would cap out its " +
        "replacement passes every run; export SPARK_GRAFT_PROBE_REF=" + Bench.fmt(floor, 3) +
        " or commit the new floor (BASELINE.md protocol).")
  }
}
