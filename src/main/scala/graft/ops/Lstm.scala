package graft.ops

/** Full-gradient LSTM training kernel — the driver-loop completion of
  * the registry's m5b (forward, hash-proven) and m5c (one BPTT step on
  * the unit-1 input weights, hash-proven) rows: all 32 parameters of
  * the 2-unit cell (per unit j, per gate k ∈ {i,f,g,o}: input weight a,
  * recurrent weights b (h1) and c (h2), bias d), trained by plain SGD
  * on the m5b loss L = (h1_T − 1/4)² + (h2_T + 1/4)².
  *
  * This is the piece the reference's Keras `fit` provides
  * (weather_pred.py:283-384): repeated gradient steps. Each step is a
  * pure fold over one series — on a cluster the same function runs
  * inside `mapGroups` (per-series models, the reference's shape:
  * one model per (country, state, feature)), or the per-series
  * gradients reduce through one `treeAggregate` of 32 doubles for a
  * shared model. LstmTrainingSpec proves the gradient against central
  * finite differences (the autodiff ground truth) and that the loop
  * actually trains (orders-of-magnitude loss reduction); the
  * cross-engine bit-level proof of the same backward chain lives in
  * m5c's DuckDB replay.
  */
object Lstm {

  /** Parameter index: ((j-1)*4 + gate)*4 + component; gate 0=i 1=f 2=g
    * 3=o; component 0=a(x) 1=b(h1) 2=c(h2) 3=d(bias). */
  def idx(j: Int, gate: Int, comp: Int): Int = ((j - 1) * 4 + gate) * 4 + comp

  /** m5b's fixed eighth-valued init (MlQueries w(j, gi)). */
  def initEighths: Array[Double] = {
    val p = new Array[Double](32)
    for (j <- 1 to 2; g <- 0 until 4) {
      val base = j * 31 + g * 17
      p(idx(j, g, 0)) = ((base * 7) % 9 - 4) / 8.0
      p(idx(j, g, 1)) = ((base * 11) % 9 - 4) / 8.0
      p(idx(j, g, 2)) = ((base * 13) % 9 - 4) / 8.0
      p(idx(j, g, 3)) = ((base * 5) % 9 - 4) / 8.0
    }
    p
  }

  private def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
  private def tnh(z: Double) = { val e = math.exp(2 * z); (e - 1) / (e + 1) }

  /** Forward + full BPTT: returns (loss, gradient over all 32 params).
    * Targets fixed at (1/4, −1/4) as in m5b/m5c.
    */
  def lossAndGrad(xs: Array[Double], p: Array[Double])
      : (Double, Array[Double]) = {
    val tM = xs.length
    require(tM >= 1, "empty series")
    // forward, storing per-step states
    val h = Array.ofDim[Double](2, tM + 1)
    val c = Array.ofDim[Double](2, tM + 1)
    val gates = Array.ofDim[Double](2, 4, tM + 1) // (unit-1, gate, t)
    var t = 1
    while (t <= tM) {
      val x = xs(t - 1)
      var j = 1
      while (j <= 2) {
        var g = 0
        while (g < 4) {
          val z = ((p(idx(j, g, 0)) * x + p(idx(j, g, 1)) * h(0)(t - 1)) +
            p(idx(j, g, 2)) * h(1)(t - 1)) + p(idx(j, g, 3))
          gates(j - 1)(g)(t) = if (g == 2) tnh(z) else sig(z)
          g += 1
        }
        c(j - 1)(t) = gates(j - 1)(1)(t) * c(j - 1)(t - 1) +
          gates(j - 1)(0)(t) * gates(j - 1)(2)(t)
        h(j - 1)(t) = gates(j - 1)(3)(t) * tnh(c(j - 1)(t))
        j += 1
      }
      t += 1
    }
    val y = Array(0.25, -0.25)
    val loss = (h(0)(tM) - y(0)) * (h(0)(tM) - y(0)) +
      (h(1)(tM) - y(1)) * (h(1)(tM) - y(1))
    // backward through time, all 32 gradients
    val grad = new Array[Double](32)
    val dh = Array(2 * (h(0)(tM) - y(0)), 2 * (h(1)(tM) - y(1)))
    val dc = Array(0.0, 0.0)
    t = tM
    while (t >= 1) {
      val x = xs(t - 1)
      val dz = Array.ofDim[Double](2, 4)
      var j = 0
      while (j < 2) {
        val (gi, gf, gg, go) = (gates(j)(0)(t), gates(j)(1)(t),
          gates(j)(2)(t), gates(j)(3)(t))
        val tc = tnh(c(j)(t))
        dz(j)(3) = (dh(j) * tc) * (go * (1 - go))
        dc(j) += (dh(j) * go) * (1 - tc * tc)
        dz(j)(0) = (dc(j) * gg) * (gi * (1 - gi))
        dz(j)(1) = (dc(j) * c(j)(t - 1)) * (gf * (1 - gf))
        dz(j)(2) = (dc(j) * gi) * (1 - gg * gg)
        j += 1
      }
      // parameter gradients
      j = 0
      while (j < 2) {
        var g = 0
        while (g < 4) {
          val d = dz(j)(g)
          grad(idx(j + 1, g, 0)) += d * x
          grad(idx(j + 1, g, 1)) += d * h(0)(t - 1)
          grad(idx(j + 1, g, 2)) += d * h(1)(t - 1)
          grad(idx(j + 1, g, 3)) += d
          g += 1
        }
        j += 1
      }
      // propagate to t-1 through the recurrent weights + forget gates
      var nh0 = 0.0; var nh1 = 0.0
      j = 0
      while (j < 2) {
        var g = 0
        while (g < 4) {
          nh0 += dz(j)(g) * p(idx(j + 1, g, 1))
          nh1 += dz(j)(g) * p(idx(j + 1, g, 2))
          g += 1
        }
        dc(j) = dc(j) * gates(j)(1)(t)
        j += 1
      }
      dh(0) = nh0; dh(1) = nh1
      t -= 1
    }
    (loss, grad)
  }

  /** Plain-SGD training loop; returns the per-step loss trace and the
    * final parameters. */
  def train(xs: Array[Double], p0: Array[Double], lr: Double,
      steps: Int): (IndexedSeq[Double], Array[Double]) = {
    val p = p0.clone()
    val trace = (0 until steps).map { _ =>
      val (loss, g) = lossAndGrad(xs, p)
      var i = 0
      while (i < 32) { p(i) -= lr * g(i); i += 1 }
      loss
    }
    (trace, p)
  }
}
