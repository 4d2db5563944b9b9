package graft.ops

/** Numerical ODE integration kernels (SURVEY.md §2.10 M3). The
  * reference integrates the SIR system with scipy's odeint
  * (covid_simulator.py:123-154); here it is a classic fixed-step RK4 —
  * a pure function of the ordered group, run task-locally inside
  * `flatMapGroups`.
  */
object Integrators {

  /** SIR vector field with a piecewise-constant covariate term z:
    *   dc/dt = alpha*s*c - beta*c - z
    *   dr/dt = beta*c + z
    *   ds/dt = -alpha*s*c
    * (c = confirmed/infected, r = removed, s = susceptible; alpha is
    * already scaled by 1/N as in the reference's generate_dataset).
    */
  private def f(c: Double, r: Double, s: Double,
      alpha: Double, beta: Double, z: Double): (Double, Double, Double) =
    (alpha * s * c - beta * c - z, beta * c + z, -alpha * s * c)

  /** Integrate one RK4 step of size h. */
  def rk4Step(c: Double, r: Double, s: Double,
      alpha: Double, beta: Double, z: Double, h: Double): (Double, Double, Double) = {
    val (k1c, k1r, k1s) = f(c, r, s, alpha, beta, z)
    val (k2c, k2r, k2s) =
      f(c + h / 2 * k1c, r + h / 2 * k1r, s + h / 2 * k1s, alpha, beta, z)
    val (k3c, k3r, k3s) =
      f(c + h / 2 * k2c, r + h / 2 * k2r, s + h / 2 * k2s, alpha, beta, z)
    val (k4c, k4r, k4s) =
      f(c + h * k3c, r + h * k3r, s + h * k3s, alpha, beta, z)
    (c + h / 6 * (k1c + 2 * k2c + 2 * k3c + k4c),
      r + h / 6 * (k1r + 2 * k2r + 2 * k3r + k4r),
      s + h / 6 * (k1s + 2 * k2s + 2 * k3s + k4s))
  }

  /** RK4-integrate the SIR system over `z1.length` daily points; the
    * covariate z1(t) is held constant over [t, t+1). Negatives are
    * clamped to 0 as in the reference (covid_simulator.py:151).
    */
  def sirRk4(confirmed0: Double, removed0: Double, n0: Double,
      alpha: Double, beta: Double,
      z1: IndexedSeq[Double]): IndexedSeq[(Double, Double, Double)] = {
    val out = Array.ofDim[(Double, Double, Double)](z1.length)
    var c = confirmed0; var r = removed0; var s = n0
    var t = 0
    while (t < z1.length) {
      if (t > 0) {
        val (cN, rN, sN) = rk4Step(c, r, s, alpha, beta, z1(t), 1.0)
        c = math.max(0.0, cN); r = math.max(0.0, rN); s = math.max(0.0, sN)
      }
      out(t) = (c, r, s)
      t += 1
    }
    out.toIndexedSeq
  }

  /** Steps taken by the last [[sirAdaptive]] call on this thread —
    * diagnostic only (the spec uses it to show the controller actually
    * adapts: few steps on smooth days, many where the field is stiff).
    */
  val lastAdaptiveSteps = new ThreadLocal[Int] { override def initialValue = 0 }

  /** ADAPTIVE integration (round 9, closing the odeint parity gap): the
    * reference integrates with scipy's odeint — LSODA, adaptive step
    * (covid_simulator.py:150) — while sirRk4 takes one fixed daily
    * step. This kernel adds step-doubling error control on the same RK4
    * stage function: advance [t, t+1) by one h-step AND two h/2-steps,
    * estimate the local error from the 15-fold Richardson gap of the
    * 4th-order pair, accept when err ≤ atol + rtol·|y|, and grow/shrink
    * h by the standard 5th-root controller (0.9 safety, clamped ×5/÷10
    * like odeint's). Accepted values use local extrapolation
    * (y₂ + (y₂−y₁)/15 — 5th-order, the "RK45" half of step-doubling),
    * so the accepted trajectory is one order better than its error
    * estimate. The covariate z is still piecewise-constant per day,
    * matching how the reference feeds z1 into odeint one day at a time.
    *
    * Purpose: ground truth for the fixed-step kernel. IntegratorsSpec
    * drives both over real per-state parameter sets and quantifies the
    * daily-h truncation error; on stiff parameterizations (large
    * alpha·N) the fixed step visibly diverges and THIS kernel is the
    * one to trust. Runs task-locally inside flatMapGroups like sirRk4 —
    * adaptivity changes per-task CPU, not the distribution plan.
    */
  def sirAdaptive(confirmed0: Double, removed0: Double, n0: Double,
      alpha: Double, beta: Double, z1: IndexedSeq[Double],
      rtol: Double = 1e-8, atol: Double = 1e-8)
      : IndexedSeq[(Double, Double, Double)] = {
    val out = Array.ofDim[(Double, Double, Double)](z1.length)
    var c = confirmed0; var r = removed0; var s = n0
    var steps = 0
    var t = 0
    while (t < z1.length) {
      if (t > 0) {
        val z = z1(t)
        var remaining = 1.0
        var h = math.min(1.0, remaining)
        var guard = 0
        while (remaining > 1e-12 && guard < 100000) {
          if (h > remaining) h = remaining
          val (c1, r1, s1) = rk4Step(c, r, s, alpha, beta, z, h)
          val (ch, rh, sh) = rk4Step(c, r, s, alpha, beta, z, h / 2)
          val (c2, r2, s2) = rk4Step(ch, rh, sh, alpha, beta, z, h / 2)
          def comp(a: Double, b: Double, y: Double): Double =
            math.abs(a - b) / 15.0 / (atol + rtol * math.abs(y))
          val err = math.max(comp(c1, c2, c2),
            math.max(comp(r1, r2, r2), comp(s1, s2, s2)))
          if (err <= 1.0) {
            // accept with 5th-order local extrapolation
            c = c2 + (c2 - c1) / 15.0
            r = r2 + (r2 - r1) / 15.0
            s = s2 + (s2 - s1) / 15.0
            remaining -= h
            steps += 1
          }
          val factor =
            if (err <= 1e-30) 5.0
            else math.min(5.0, math.max(0.1, 0.9 * math.pow(err, -0.2)))
          h = h * factor
          guard += 1
        }
        require(remaining <= 1e-12,
          s"adaptive step controller failed to advance at day $t (h=$h)")
        c = math.max(0.0, c); r = math.max(0.0, r); s = math.max(0.0, s)
      }
      out(t) = (c, r, s)
      t += 1
    }
    lastAdaptiveSteps.set(steps)
    out.toIndexedSeq
  }
}
