package graft

import graft.ops.Lstm
import org.scalatest.funsuite.AnyFunSuite

/** Proves the LSTM training loop end-to-end (pure JVM — the fold that
  * runs inside mapGroups on a cluster):
  *
  *  1. The analytic BPTT gradient matches central finite differences on
  *     every one of the 32 parameters — the standard autodiff ground
  *     truth; any sign/indexing/chain-rule error in the backward pass
  *     fails here before it could hide in a plausible-looking loss
  *     curve. (Cross-engine bit-level correctness of the same backward
  *     chain is m5c's DuckDB replay; this is the math-level check.)
  *  2. SGD on that gradient actually TRAINS: loss is monotone
  *     non-increasing at a stable learning rate and drops by orders of
  *     magnitude, with the final hidden state at the fitted targets —
  *     the capability the reference buys from Keras `fit`
  *     (weather_pred.py:283-384).
  */
class LstmTrainingSpec extends AnyFunSuite {

  private val xs =
    Array.tabulate(8)(t => 0.6 * math.sin(1.7 * t + 0.3) + 0.2)

  test("BPTT gradient matches central finite differences on all 32 params") {
    val p = Lstm.initEighths
    val (_, g) = Lstm.lossAndGrad(xs, p)
    val eps = 1e-6
    var worst = 0.0
    for (i <- 0 until 32) {
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      val num = (Lstm.lossAndGrad(xs, pp)._1 -
        Lstm.lossAndGrad(xs, pm)._1) / (2 * eps)
      val err = math.abs(num - g(i)) / (1e-8 + math.abs(num).max(math.abs(g(i))))
      worst = worst.max(err)
      assert(err < 1e-5,
        s"param $i: analytic ${g(i)} vs finite-diff $num (rel err $err)")
    }
    info(f"worst relative gradient error: $worst%.2e")
  }

  test("SGD training converges: monotone loss, orders-of-magnitude drop") {
    val (trace, pFit) = Lstm.train(xs, Lstm.initEighths, lr = 0.5,
      steps = 400)
    // monotone non-increasing at this rate (tiny fp slack)
    trace.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-12, s"loss rose: ${w(0)} -> ${w(1)}")
    }
    assert(trace.last < 1e-4 * trace.head,
      s"insufficient training: ${trace.head} -> ${trace.last}")
    // the fitted forward pass lands on the (1/4, -1/4) targets
    val (finalLoss, _) = Lstm.lossAndGrad(xs, pFit)
    assert(finalLoss < 1e-5, s"final loss $finalLoss")
  }

  test("init matches m5b/m5c's eighth-valued weight table") {
    val p = Lstm.initEighths
    // spot-pin the four unit-1 i-gate weights against the literals the
    // m5b/m5c oracles hard-code (w(1,0) = (-0.375, 0.5, 0.375, -0.25))
    assert(p(Lstm.idx(1, 0, 0)) == -0.375)
    assert(p(Lstm.idx(1, 0, 1)) == 0.5)
    assert(p(Lstm.idx(1, 0, 2)) == 0.375)
    assert(p(Lstm.idx(1, 0, 3)) == -0.25)
    // and the unit-2 o-gate row (w(2,3) = (0.5, -0.375, -0.25, 0.375))
    assert(p(Lstm.idx(2, 3, 0)) == 0.5)
    assert(p(Lstm.idx(2, 3, 1)) == -0.375)
    assert(p(Lstm.idx(2, 3, 2)) == -0.25)
    assert(p(Lstm.idx(2, 3, 3)) == 0.375)
  }
}
