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
}
