package graft

/** Pure estimator logic of the scaling benchmark (see Bench.scala for
  * the measurement rationale), extracted so the gating/convergence rules
  * are unit-testable against recorded sample vectors from real runs.
  */
object BenchProtocol {

  /** One measured run bracketed by machine-capacity probes: register
    * spins (host CPU steal) and DRAM bandwidth (co-tenant memory
    * pressure). The window reading is the worse of the pre/post probes.
    */
  final case class Sample(sec: Double, spinPre: Double, spinPost: Double,
      memPre: Double, memPost: Double) {
    def windowSpin: Double = math.min(spinPre, spinPost)
    def windowMem: Double = math.min(memPre, memPost)
  }

  /** Samples taken in ~full-capacity windows relative to the best window
    * seen (re-evaluated as the best rises). `memGate` applies the DRAM
    * gate too — used for the multi-thread level, which is
    * bandwidth-sensitive; the 1-thread level gates on spin only (a
    * single thread is bandwidth-insensitive). Fallback chain so a
    * uniformly depressed run still reports: gates → spin → all.
    *
    * Acceptance drives the RETRY/STOP policy and window attribution, NOT
    * the point estimate: host steal is one-sided (a depressed window can
    * only slow a run, never speed it), so a sample's own wall-clock is
    * itself evidence of its window's quality, and excluding any sample
    * from a min-estimator can only worsen the estimate — observed live
    * when the mem gate rejected a FASTER 4t draw taken in a
    * lower-bandwidth window.
    */
  def accepted(xs: Seq[Sample], memGate: Boolean): Seq[Sample] = {
    if (xs.isEmpty) return xs
    val bestSpin = xs.map(_.windowSpin).max
    val bestMem = xs.map(_.windowMem).max
    val spinOk = xs.filter(_.windowSpin >= 0.9 * bestSpin)
    val ok = if (memGate) spinOk.filter(_.windowMem >= 0.75 * bestMem)
      else spinOk
    if (ok.nonEmpty) ok else if (spinOk.nonEmpty) spinOk else xs
  }

  /** Two honest-window samples at a level agree within 10% (the stopping
    * signal — stability among samples whose windows kept full machine
    * capacity). Applied SYMMETRICALLY: the 4-thread level gates on
    * spin + DRAM (`memGate = true`), the 1-thread level on spin only —
    * steal inflates BOTH levels' minima (the 4t denominator lowers the
    * reported ratio, the 1t numerator raises it), so neither level's
    * sampling may stop while its own minimum is still unstable.
    */
  def converged(xs: Seq[Sample], memGate: Boolean = true): Boolean = {
    val s = accepted(xs, memGate).map(_.sec).sorted
    s.length >= 2 && (s(1) - s(0)) / s(0) <= 0.10
  }

  /** min(all 1t) / min(all 4t) / 4 — a POINT ESTIMATE of the un-stolen
    * capacity ratio, not a bound in either direction: steal is one-sided,
    * so each level's minimum is an UPPER bound on that level's honest
    * runtime that extra samples tighten independently — but a ratio of
    * two upper bounds can err either way (a stolen 1t minimum inflates
    * the estimate exactly as a stolen 4t minimum deflates it). Accuracy
    * therefore comes from per-level convergence (`converged`, checked
    * symmetrically at both levels), never from the sample count at one
    * level alone.
    */
  def efficiency(ns: Seq[Sample], fs: Seq[Sample]): Double =
    if (ns.isEmpty || fs.isEmpty) 0.0
    else (ns.map(_.sec).min / fs.map(_.sec).min) / 4.0

  /** Which level to sample next (None = stop). Pure policy, extracted for
    * unit tests:
    *  - unconverged levels first — each level keeps drawing while its own
    *    honest-window samples have not converged;
    *  - when both need draws, 4t goes twice per 1t (`sinceLast1` counts
    *    4t draws since the last 1t): 4t is 3-4× cheaper and its windows
    *    are noisier, but the 1t minimum must keep converging too or a
    *    stolen numerator inflates the ratio;
    *  - a converged level may keep tightening (its min only improves)
    *    while the budget allows — affordability is decided by the caller
    *    (soft budget for converged levels, hard cap for unconverged).
    */
  def nextLevel(c4: Boolean, c1: Boolean, sinceLast1: Int,
      afford4: Boolean, afford1: Boolean): Option[Int] =
    if (!c4 && !c1 && sinceLast1 >= 2 && afford1) Some(1)
    else if (!c4 && afford4) Some(4)
    else if (!c1 && afford1) Some(1)
    else if (afford4) Some(4)
    else if (afford1) Some(1)
    else None

  /** Same-window paired ratios, emitted only when trustworthy: a
    * (1t, 4t) pair of adjacent samples qualifies iff BOTH members pass
    * their level's acceptance gates, and the ratio is ≤ 1.0 — a parallel
    * efficiency above 1.0 is physically impossible at this working-set
    * size and is evidence the "pair" spanned a machine-phase change
    * (observed live: a storm-inflated 225 s 1t draw paired against a
    * clean 39.9 s 4t draw printed 1.41). Returns the qualifying ratios;
    * empty means no honest pair existed and the field is omitted.
    */
  def pairedEfficiencies(pairs: Seq[(Sample, Sample)], ns: Seq[Sample],
      fs: Seq[Sample]): Seq[Double] = {
    val okN = accepted(ns, memGate = false).toSet
    val okF = accepted(fs, memGate = true).toSet
    pairs.collect {
      case (n, f) if okN.contains(n) && okF.contains(f) &&
        (n.sec / f.sec) / 4.0 <= 1.0 => (n.sec / f.sec) / 4.0
    }
  }
}
