package graft

import graft.ops.Integrators
import org.scalatest.funsuite.AnyFunSuite

class IntegratorsSpec extends AnyFunSuite {

  test("sirRk4 conserves c+r+s when z=0 (closed system invariant)") {
    val sim = Integrators.sirRk4(10.0, 2.0, 500.0, 1e-4, 0.05,
      IndexedSeq.fill(30)(0.0))
    val total0 = 10.0 + 2.0 + 500.0
    sim.foreach { case (c, r, s) =>
      assert(math.abs(c + r + s - total0) < 1e-9)
    }
  }

  test("sirRk4 with alpha=0, z=0 decays infected exponentially (beta-removal only)") {
    val beta = 0.1
    val sim = Integrators.sirRk4(100.0, 0.0, 1000.0, 0.0, beta,
      IndexedSeq.fill(10)(0.0))
    // dc/dt = -beta*c has exact solution c0*exp(-beta*t); RK4 at h=1 is
    // accurate to O(h^5) per step
    (0 until 10).foreach { t =>
      val exact = 100.0 * math.exp(-beta * t)
      assert(math.abs(sim(t)._1 - exact) < 1e-4,
        s"t=$t rk4=${sim(t)._1} exact=$exact")
    }
  }

  test("sirRk4 matches a single hand-rolled rk4Step") {
    val sim = Integrators.sirRk4(45.0, 0.7, 1000.0, 1e-5, 0.05,
      IndexedSeq(0.08, 0.06))
    val step = Integrators.rk4Step(45.0, 0.7, 1000.0, 1e-5, 0.05, 0.06, 1.0)
    assert(sim(1)._1 == math.max(0.0, step._1))
    assert(sim(1)._2 == math.max(0.0, step._2))
    assert(sim(1)._3 == math.max(0.0, step._3))
  }

  test("sirRk4 clamps negatives to zero (reference covid_simulator.py:151)") {
    // large beta drives c negative without clamping
    val sim = Integrators.sirRk4(1.0, 0.0, 10.0, 0.0, 5.0,
      IndexedSeq.fill(5)(0.5))
    sim.foreach { case (c, r, s) =>
      assert(c >= 0.0 && r >= 0.0 && s >= 0.0)
    }
  }

  // ---- adaptive step-doubling (round 9: odeint parity) ----

  /** Three REAL per-state parameterizations pulled from the pipeline
    * fit over the committed pop_dataset (alpha = beta·R₀/N with the
    * REML-EM β and the replay-verified R₀; z ≈ cI + cG·gov_action):
    * a large state (IL), the stiffest committed state (UT, R₀≈201),
    * and a tiny-population state (WY). 60-day horizon like the
    * reference's runSimulator(horizon1=60).
    */
  private val states = Seq(
    ("IL", 4.0, 0.0, 1.2671821e7, 0.05 * 49.99 / 1.2671821e7, 0.05, 1.3),
    ("UT", 1.0, 0.0, 3.205958e6, 0.0494 * 201.5 / 3.205958e6, 0.0494, 1.3),
    ("WY", 1.0, 0.0, 5.78759e5, 0.0494 * 3.4 / 5.78759e5, 0.0494, 0.5))

  /** Fixed-step RK4 at h = 1/k within each day — the brute-force
    * resolved reference the adaptive controller is checked against.
    */
  private def sirFine(c0: Double, r0: Double, n0: Double, alpha: Double,
      beta: Double, z1: IndexedSeq[Double], k: Int)
      : IndexedSeq[(Double, Double, Double)] = {
    val out = Array.ofDim[(Double, Double, Double)](z1.length)
    var c = c0; var r = r0; var s = n0
    for (t <- z1.indices) {
      if (t > 0) {
        val h = 1.0 / k
        var i = 0
        while (i < k) {
          val (cN, rN, sN) = Integrators.rk4Step(c, r, s, alpha, beta, z1(t), h)
          c = cN; r = rN; s = sN
          i += 1
        }
        c = math.max(0.0, c); r = math.max(0.0, r); s = math.max(0.0, s)
      }
      out(t) = (c, r, s)
    }
    out.toIndexedSeq
  }

  private def relErr(a: IndexedSeq[(Double, Double, Double)],
      b: IndexedSeq[(Double, Double, Double)], n0: Double): Double =
    a.zip(b).map { case ((c1, r1, _), (c2, r2, _)) =>
      // population-relative, the scale the simulator's outputs live on;
      // a NaN/Inf trajectory (fixed-step blow-up) counts as divergence
      val e = math.max(math.abs(c1 - c2), math.abs(r1 - r2)) / n0
      if (java.lang.Double.isFinite(e)) e else Double.PositiveInfinity
    }.max

  test("adaptive trajectory matches resolved fixed-step ground truth on 3 states") {
    states.foreach { case (name, c0, r0, n0, alpha, beta, z) =>
      val z1 = IndexedSeq.tabulate(60)(t => if (t < 27) z else z + 0.8)
      val adaptive = Integrators.sirAdaptive(c0, r0, n0, alpha, beta, z1,
        rtol = 1e-10, atol = 1e-10)
      val fine = sirFine(c0, r0, n0, alpha, beta, z1, 512)
      val err = relErr(adaptive, fine, n0)
      assert(err < 1e-9, s"state $name adaptive-vs-fine rel err $err")
    }
  }

  test("daily-h truncation quantified per regime: fine at low R0, real at high R0") {
    // The m3 ODE kernel steps h=1/day. The adaptive integrator is the
    // ground truth saying what that buys: at WY-like growth rates
    // (alpha·N ≈ 0.17/day) daily RK4 tracks the resolved ODE to <1e-6
    // of population, but at the committed HIGH-R0 parameterizations
    // (IL: alpha·N ≈ 2.5/day, UT: ≈ 10/day) the measured truncation is
    // 1e-2..2e-1 of population — on those, sirAdaptive is the kernel to
    // trust. (The reference's own runSimulator uses the DISCRETE daily
    // recurrence, covid_simulator.py:39-58, which our simulate()
    // replicates exactly — this divergence is about the continuous-ODE
    // demo path, covid_simulator.py:123-154, where odeint adapts and a
    // fixed daily step cannot.)
    val errs = states.map { case (name, c0, r0, n0, alpha, beta, z) =>
      val z1 = IndexedSeq.tabulate(60)(t => if (t < 27) z else z + 0.8)
      val adaptive = Integrators.sirAdaptive(c0, r0, n0, alpha, beta, z1)
      val daily = Integrators.sirRk4(c0, r0, n0, alpha, beta, z1)
      name -> relErr(adaptive, daily, n0)
    }.toMap
    assert(errs("WY") < 1e-6, s"WY daily-h truncation ${errs("WY")}")
    assert(errs("IL") > 1e-2 && errs("IL") < 0.5,
      s"IL daily-h truncation ${errs("IL")} — expected the measured ~0.13")
    // UT's daily-h trajectory overflows outright (measured: NaN →
    // mapped to +Inf): the sharpest form of "adaptive is the one to trust"
    assert(errs("UT") > 1e-2, s"UT daily-h truncation ${errs("UT")}")
  }

  test("controller adapts: stiff fields get more steps and daily-h diverges there") {
    // mid-epidemic stiff regime: alpha*s ~ 1.5/day growth rate
    val (c0, r0, n0) = (5e4, 1e4, 1e6)
    val (alpha, beta) = (1.6e-6, 0.3)
    val z1 = IndexedSeq.fill(30)(10.0)
    val adaptive = Integrators.sirAdaptive(c0, r0, n0, alpha, beta, z1,
      rtol = 1e-10, atol = 1e-10)
    val stiffSteps = Integrators.lastAdaptiveSteps.get()
    val fine = sirFine(c0, r0, n0, alpha, beta, z1, 2048)
    assert(relErr(adaptive, fine, n0) < 1e-7,
      s"adaptive vs resolved on stiff field: ${relErr(adaptive, fine, n0)}")
    val daily = Integrators.sirRk4(c0, r0, n0, alpha, beta, z1)
    assert(relErr(daily, fine, n0) > 1e-4,
      "expected visible daily-h truncation on the stiff field " +
        s"(got ${relErr(daily, fine, n0)}) — the adaptive kernel is the " +
        "one to trust here")
    // smooth regime takes far fewer steps than the stiff one
    Integrators.sirAdaptive(1.0, 0.0, 5.78759e5, 2.9e-7, 0.0494,
      IndexedSeq.fill(30)(0.5), rtol = 1e-10, atol = 1e-10)
    val smoothSteps = Integrators.lastAdaptiveSteps.get()
    assert(stiffSteps > 2 * smoothSteps,
      s"controller not adapting: stiff=$stiffSteps smooth=$smoothSteps")
  }
}
