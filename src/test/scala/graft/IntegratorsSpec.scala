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
}
