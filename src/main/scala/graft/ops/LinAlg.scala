package graft.ops

/** Minimal dense linear algebra for the closed-form model fits (M2):
  * Gaussian elimination with partial pivoting — the systems here are
  * 2×2..4×4 normal equations assembled from distributed sums, solved
  * on the driver.
  */
object LinAlg {

  /** The native codegen dot product (graft.functions.DotProduct,
    * injected by GraftExtensions as `graft_dot`) — the single wrapper
    * every vector query uses; the interpreted HOF spelling
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is ~40× slower. Same
    * accumulation order as the HOF version and the DuckDB oracles'
    * list_sum(list_transform(list_zip(...))), so doubles match
    * bit-for-bit.
    */
  def dot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)

  /** Solve A x = b in place (A square, row-major copies made). */
  def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) {
        if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
        r += 1
      }
      if (piv != col) {
        val t = a(col); a(col) = a(piv); a(piv) = t
        val tb = b(col); b(col) = b(piv); b(piv) = tb
      }
      require(math.abs(a(col)(col)) > 1e-12, s"singular system at col $col")
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        var c = col
        while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var acc = b(i)
      var j = i + 1
      while (j < n) { acc -= a(i)(j) * x(j); j += 1 }
      x(i) = acc / a(i)(i)
      i -= 1
    }
    x
  }
}
