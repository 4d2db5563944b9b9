package graft.ops

/** Pure, order-sensitive per-group recurrences (SURVEY.md §2.7 W5-W7).
  * These are the three reference kernels that cannot be expressed as
  * window functions — each output depends on the *already-computed*
  * previous output. They run inside `groupByKey.flatMapGroups`: one
  * group = one task-local fold, distributed across executors by the
  * group key (same parallelism the reference's per-location loops
  * imply, minus the single-process bottleneck).
  */
object Sequential {

  /** W5 — the reference's sequential neighbor smoothing
    * (covid_data_transform.py:204-237). Per ordered group:
    *  - all-null group → all zeros (fillna(0) branch);
    *  - edge rows (first/last): null → 0, else keep;
    *  - interior rows are REWRITTEN unconditionally to
    *    (prev + next)/2 where prev is the already-smoothed previous
    *    value and next the raw next; null next → prev/2.
    * `[5, null, null, 8]` → `[5, 2.5, 5.25, 8]`.
    */
  def smoothFill(xs: IndexedSeq[Option[Double]]): IndexedSeq[Double] = {
    val n = xs.length
    if (n == 0) return IndexedSeq.empty
    if (xs.forall(_.isEmpty)) return IndexedSeq.fill(n)(0.0)
    val cur = xs.map(_.getOrElse(Double.NaN)).toArray
    var i = 0
    while (i < n) {
      if (i == 0 || i == n - 1) {
        if (cur(i).isNaN) cur(i) = 0.0
      } else {
        val prev = cur(i - 1)
        val next = cur(i + 1)
        cur(i) = if (next.isNaN) prev / 2 else (prev + next) / 2
      }
      i += 1
    }
    // trailing fillna(0) (covid_data_transform.py:235)
    cur.map(v => if (v.isNaN) 0.0 else v).toIndexedSeq
  }

  /** W6 — discrete SIR recurrence (covid_simulator.py:193-212).
    * State (pc, pr, ps) = (pred_confirmed, pred_removed,
    * pred_susceptible); per step t>0 with covariate z1(t):
    *   pc' = pc + alpha*ps*pc - beta*pc - z1
    *   pr' = pr + beta*pc + z1
    *   ps' = ps - alpha*ps*pc
    * (arithmetic written in exactly this order so the DuckDB oracle's
    * left-associative evaluation matches bit-for-bit).
    */
  def sirSimulate(
      confirmed0: Double, removed0: Double, n0: Double,
      alpha: Double, beta: Double,
      z1: IndexedSeq[Double]): IndexedSeq[(Double, Double, Double)] = {
    val out = Array.ofDim[(Double, Double, Double)](z1.length)
    var pc = confirmed0
    var pr = removed0
    var ps = n0
    var t = 0
    while (t < z1.length) {
      if (t > 0) {
        val z = z1(t)
        val pcN = pc + alpha * ps * pc - beta * pc - z
        val prN = pr + beta * pc + z
        val psN = ps - alpha * ps * pc
        pc = pcN; pr = prN; ps = psN
      }
      out(t) = (pc, pr, ps)
      t += 1
    }
    out.toIndexedSeq
  }

  /** W7 — autoregressive rollout (weather_pred.py:352-374): keep a
    * sliding window of the last `weights.length` values, predict the
    * next as w·x + bias, feed the prediction back, repeat.
    */
  def arRollout(
      seed: IndexedSeq[Double], weights: IndexedSeq[Double],
      bias: Double, steps: Int): IndexedSeq[Double] = {
    require(seed.length == weights.length)
    val window = seed.toArray
    val out = Array.ofDim[Double](steps)
    var s = 0
    while (s < steps) {
      var acc = 0.0
      var i = 0
      while (i < weights.length) { acc += weights(i) * window(i); i += 1 }
      val pred = acc + bias
      // shift left, append prediction (np.append(future_x[1:], [y]))
      System.arraycopy(window, 1, window, 0, window.length - 1)
      window(window.length - 1) = pred
      out(s) = pred
      s += 1
    }
    out.toIndexedSeq
  }

  /** W19 — exponentially weighted moving average, the standard
    * time-series smoother (pandas `ewm(alpha).mean()` with
    * `adjust=False`): e(0) = x(0), e(t) = α·x(t) + (1−α)·e(t−1).
    * The arithmetic is written exactly as `alpha * x + oneMinus * e`
    * with both constants passed in as exact binary doubles, so a
    * recursive-CTE oracle evaluating the same left-associative
    * expression matches bit-for-bit — no rounding tolerance.
    */
  def ewma(xs: IndexedSeq[Double], alpha: Double,
      oneMinus: Double): IndexedSeq[Double] = {
    if (xs.isEmpty) return IndexedSeq.empty
    val out = Array.ofDim[Double](xs.length)
    var e = xs(0)
    out(0) = e
    var i = 1
    while (i < xs.length) {
      e = alpha * xs(i) + oneMinus * e
      out(i) = e
      i += 1
    }
    out.toIndexedSeq
  }

  /** W20 — Holt double-exponential smoothing (level + linear trend),
    * `alpha`/`beta` MUST be exact binary doubles (0.25, 0.5) so the
    * DuckDB recursive-CTE oracle matches bit-for-bit. Init: level =
    * first value, trend = 0. Per step (this exact op order, mirrored
    * literally in the oracle):
    *   level' = alpha*x + (1-alpha)*(level + trend)
    *   trend' = beta*(level' - level) + (1-beta)*trend
    * Returns (level, trend, forecast = level + trend) per input.
    */
  def holt(xs: IndexedSeq[Double], alpha: Double, oneMinusAlpha: Double,
      beta: Double, oneMinusBeta: Double)
      : IndexedSeq[(Double, Double, Double)] = {
    if (xs.isEmpty) return IndexedSeq.empty
    val out = Array.ofDim[(Double, Double, Double)](xs.length)
    var level = xs(0)
    var trend = 0.0
    out(0) = (level, trend, level + trend)
    var i = 1
    while (i < xs.length) {
      val nl = alpha * xs(i) + oneMinusAlpha * (level + trend)
      val nt = beta * (nl - level) + oneMinusBeta * trend
      level = nl
      trend = nt
      out(i) = (level, trend, level + trend)
      i += 1
    }
    out.toIndexedSeq
  }

  /** W27 — Holt–Winters ADDITIVE triple-exponential smoothing (level +
    * trend + period-`m` seasonal), completing the w19 (EWMA) / w20
    * (Holt) smoothing family. All smoothing constants MUST be exact
    * binary doubles (0.25 / 0.5 / 0.125 here) so the DuckDB
    * recursive-CTE oracle — which carries the m-slot seasonal ring as
    * a LIST column — matches bit-for-bit. Init: level = first value,
    * trend = 0, all seasonal slots 0; the first observation is emitted
    * as-is (the w20 convention). Per step, in THIS op order (mirrored
    * literally by the oracle):
    *   sp     = seasonal slot for t−m   (front of the ring)
    *   level' = alpha*(x − sp) + (1−alpha)*(level + trend)
    *   trend' = beta*(level' − level) + (1−beta)*trend
    *   seas'  = gamma*(x − level') + (1−gamma)*sp
    *   ring   = shift left, append seas'
    * Returns (level, seasonal, forecast = level' + trend' + ring.head)
    * per input — the forecast is the one-step-ahead prediction, whose
    * seasonal term is the (t+1−m) slot.
    */
  def holtWinters(xs: IndexedSeq[Double], m: Int,
      alpha: Double, oneMinusAlpha: Double,
      beta: Double, oneMinusBeta: Double,
      gamma: Double, oneMinusGamma: Double)
      : IndexedSeq[(Double, Double, Double)] = {
    if (xs.isEmpty) return IndexedSeq.empty
    val out = Array.ofDim[(Double, Double, Double)](xs.length)
    val ring = Array.fill(m)(0.0)
    var level = xs(0)
    var trend = 0.0
    out(0) = (level, 0.0, level + trend + ring(0))
    var i = 1
    while (i < xs.length) {
      val sp = ring(0)
      val nl = alpha * (xs(i) - sp) + oneMinusAlpha * (level + trend)
      val nt = beta * (nl - level) + oneMinusBeta * trend
      val ns = gamma * (xs(i) - nl) + oneMinusGamma * sp
      System.arraycopy(ring, 1, ring, 0, m - 1)
      ring(m - 1) = ns
      level = nl
      trend = nt
      out(i) = (nl, ns, nl + nt + ring(0))
      i += 1
    }
    out.toIndexedSeq
  }

  /** 1-D local-level Kalman filter (random-walk state, scalar
    * observation). Classic predict/update with process variance q and
    * observation variance r:
    *   pp = P + q                      (predicted variance)
    *   K  = pp / (pp + r)              (gain)
    *   x' = x + K*(z − x)              (filtered estimate)
    *   P' = (1 − K) * pp               (posterior variance)
    * First observation initializes x = z, K = 1, P = 1 by convention
    * (a diffuse prior collapsed onto the first reading). Every step is
    * one IEEE division plus correctly-rounded add/multiply; the CTE
    * oracle replays the IDENTICAL op order via DuckDB lateral column
    * aliases, so (xhat, gain, p) are bit-stable cross-engine.
    * Returns (xhat, gain, p) per input.
    */
  def kalman1d(xs: IndexedSeq[Double], q: Double, r: Double)
      : IndexedSeq[(Double, Double, Double)] = {
    if (xs.isEmpty) return IndexedSeq.empty
    val out = Array.ofDim[(Double, Double, Double)](xs.length)
    var x = xs(0)
    var p = 1.0
    out(0) = (x, 1.0, p)
    var i = 1
    while (i < xs.length) {
      val pp = p + q
      val k = pp / (pp + r)
      x = x + k * (xs(i) - x)
      p = (1.0 - k) * pp
      out(i) = (x, k, p)
      i += 1
    }
    out.toIndexedSeq
  }

  /** One-sided positive CUSUM drift detector: S_t = max(0, S_{t-1} +
    * (x_t - k)), alarm when S_t > h. Page's classic sequential
    * change-point statistic. Op order (add the deviation, THEN clamp)
    * is mirrored literally by the recursive-CTE oracle; max and + are
    * IEEE-exact, so outputs are bit-stable cross-engine.
    */
  def cusum(xs: IndexedSeq[Double], k: Double, h: Double)
      : IndexedSeq[(Double, Boolean)] = {
    val out = Array.ofDim[(Double, Boolean)](xs.length)
    var s = 0.0
    var i = 0
    while (i < xs.length) {
      val raw = s + (xs(i) - k)
      s = if (raw > 0.0) raw else 0.0
      out(i) = (s, s > h)
      i += 1
    }
    out.toIndexedSeq
  }
}
