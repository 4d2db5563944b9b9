package graft

import graft.ops.Sequential
import org.scalatest.funsuite.AnyFunSuite

class SequentialSpec extends AnyFunSuite {

  test("smoothFill reference case [5, null, null, 8] -> [5, 2.5, 5.25, 8]") {
    val out = Sequential.smoothFill(
      IndexedSeq(Some(5.0), None, None, Some(8.0)))
    assert(out == IndexedSeq(5.0, 2.5, 5.25, 8.0))
  }

  test("smoothFill rewrites interior values unconditionally (reference in-place loop)") {
    // [1, 2, 3, 4]: i=1 -> (1+3)/2 = 2; i=2 -> (2+4)/2 = 3; edges kept
    val out = Sequential.smoothFill(
      IndexedSeq(Some(1.0), Some(2.0), Some(3.0), Some(4.0)))
    assert(out == IndexedSeq(1.0, 2.0, 3.0, 4.0))
    // [1, 10, 3, 4]: i=1 -> (1+3)/2 = 2; i=2 -> (2+4)/2 = 3
    val out2 = Sequential.smoothFill(
      IndexedSeq(Some(1.0), Some(10.0), Some(3.0), Some(4.0)))
    assert(out2 == IndexedSeq(1.0, 2.0, 3.0, 4.0))
  }

  test("smoothFill edges: null first/last -> 0") {
    val out = Sequential.smoothFill(IndexedSeq(None, Some(4.0), None))
    // i=0 -> 0; i=1 interior: next null -> prev/2 = 0; i=2 edge null -> 0
    assert(out == IndexedSeq(0.0, 0.0, 0.0))
    val out2 = Sequential.smoothFill(IndexedSeq(None, Some(4.0), Some(6.0)))
    // i=1: (0 + 6)/2 = 3
    assert(out2 == IndexedSeq(0.0, 3.0, 6.0))
  }

  test("smoothFill all-null group -> zeros; empty group -> empty") {
    assert(Sequential.smoothFill(IndexedSeq(None, None)) == IndexedSeq(0.0, 0.0))
    assert(Sequential.smoothFill(IndexedSeq.empty).isEmpty)
    assert(Sequential.smoothFill(IndexedSeq(None)) == IndexedSeq(0.0))
    assert(Sequential.smoothFill(IndexedSeq(Some(7.0))) == IndexedSeq(7.0))
  }

  test("sirSimulate first step matches hand computation") {
    // pc0=45, pr0=0.7, ps0=1000, alpha=1e-5, beta=0.05, z=[0.08, 0.06]
    val sim = Sequential.sirSimulate(45.0, 0.7, 1000.0, 1e-5, 0.05,
      IndexedSeq(0.08, 0.06))
    assert(sim(0) == ((45.0, 0.7, 1000.0)))
    val (pc, pr, ps) = sim(1)
    assert(math.abs(pc - (45.0 + 1e-5 * 1000 * 45 - 0.05 * 45 - 0.06)) < 1e-12)
    assert(math.abs(pr - (0.7 + 0.05 * 45 + 0.06)) < 1e-12)
    assert(math.abs(ps - (1000.0 - 1e-5 * 1000 * 45)) < 1e-12)
  }

  test("sirSimulate conserves pc+pr+ps when beta=0 and z1=0 (S+I+R = N + I0 + R0 invariant)") {
    val sim = Sequential.sirSimulate(10.0, 2.0, 500.0, 1e-4, 0.0,
      IndexedSeq.fill(20)(0.0))
    val total0 = 10.0 + 2.0 + 500.0
    sim.foreach { case (pc, pr, ps) =>
      assert(math.abs(pc + pr + ps - total0) < 1e-9)
    }
  }

  test("holt tracks a pure linear trend exactly after warm-up") {
    // y_t = 10 + 2t: once level/trend lock on, forecast = next value.
    // Convergence is geometric in (alpha, beta); 200 steps puts the
    // residual far below 1e-6 at these smoothing constants.
    val xs = IndexedSeq.tabulate(200)(t => 10.0 + 2.0 * t)
    val out = Sequential.holt(xs, 0.25, 0.75, 0.5, 0.5)
    assert(out.head == ((10.0, 0.0, 10.0)))
    val (l, b, f) = out.last
    assert(math.abs(l - xs.last) < 1e-6)
    assert(math.abs(b - 2.0) < 1e-6)
    assert(math.abs(f - (xs.last + 2.0)) < 1e-6)
  }

  test("holt on a constant series keeps level = value, trend = 0") {
    val out = Sequential.holt(IndexedSeq.fill(10)(7.5), 0.25, 0.75, 0.5, 0.5)
    out.foreach { case (l, b, f) =>
      assert(l == 7.5 && b == 0.0 && f == 7.5)
    }
  }

  test("holtWinters degenerates to holt when the data has no " +
      "seasonal signal and gamma keeps the ring near zero") {
    // constant series: level locks to the value, trend 0, seasonal 0
    val out = Sequential.holtWinters(IndexedSeq.fill(12)(7.5), 4,
      0.25, 0.75, 0.5, 0.5, 0.125, 0.875)
    val (l0, s0, f0) = out.head
    assert(l0 == 7.5 && s0 == 0.0 && f0 == 7.5)
    // the seasonal pulls a share of the constant level into the ring,
    // but level + seasonal must converge to the value
    val (l, sn, f) = out.last
    assert(math.abs((l + sn) - 7.5) < 0.5, s"level $l seasonal $sn")
    assert(math.abs(f - (l)) < 7.5, s"forecast $f")
  }

  test("holtWinters learns a pure period-4 seasonal pattern") {
    // y = 100 + (10, 0, -10, 0) repeating: after convergence the
    // one-step forecast must track the upcoming phase, not the mean
    val pat = IndexedSeq(10.0, 0.0, -10.0, 0.0)
    val xs = IndexedSeq.tabulate(400)(t => 100.0 + pat(t % 4))
    val out = Sequential.holtWinters(xs, 4,
      0.25, 0.75, 0.5, 0.5, 0.125, 0.875)
    // forecast at step t predicts x_{t+1}
    val errs = (360 until 399).map(t => math.abs(out(t)._3 - xs(t + 1)))
    assert(errs.max < 1.0,
      s"converged one-step error should be small, got ${errs.max}")
  }

  test("cusum accumulates drift above k, clamps at zero, and alarms") {
    // k=2, h=3: x=(5,1,1,6) -> S = (3, 2, 1, 5); alarms at 3>3? no, 5>3 yes
    val out = Sequential.cusum(IndexedSeq(5.0, 1.0, 1.0, 6.0), 2.0, 3.0)
    assert(out == IndexedSeq((3.0, false), (2.0, false), (1.0, false),
      (5.0, true)))
  }

  test("cusum stays at zero for an in-control series") {
    val out = Sequential.cusum(IndexedSeq.fill(5)(1.0), 2.0, 3.0)
    assert(out.forall(_ == ((0.0, false))))
  }

  test("arRollout feeds predictions back through the window") {
    val w = IndexedSeq(0.0, 0.0, 0.0, 0.0, 1.0) // pred = last value + bias
    val out = Sequential.arRollout(IndexedSeq(1, 2, 3, 4, 5.0), w, 0.0, 3)
    assert(out == IndexedSeq(5.0, 5.0, 5.0))
    val out2 = Sequential.arRollout(IndexedSeq(1, 2, 3, 4, 5.0), w, 1.0, 3)
    assert(out2 == IndexedSeq(6.0, 7.0, 8.0))
  }
}
