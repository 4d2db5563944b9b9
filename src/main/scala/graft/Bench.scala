package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // AQE deliberately unconfigured: adaptive execution + skew-join split
    // run at Spark's default-on posture (see Verify.scala for the full
    // note; PlanSpec pins it).
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional dev filter: `runMain graft.Bench d7_jaccard_dfcap d8_...`
    // times only the named queries (driver invokes with no args → all).
    val only = args.toSet
    val queries = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    // Warmup pass: first execution of each plan shape pays one-time JVM
    // costs (whole-stage-codegen Janino compiles, broadcast thread pool,
    // JIT) that would otherwise be attributed to whichever query happens
    // to hit that shape first. Then two timed passes, keeping the min
    // per query — GC pauses and page-cache noise inflate single samples
    // by 2x at this scale. Steady-state min is what a long-lived
    // cluster app sees.
    //
    // clearCache after every query: Dataset.persist registers the plan
    // with the session CacheManager, which holds a strong reference until
    // unpersist()/clearCache() — the ContextCleaner never reclaims
    // CacheManager entries. Without this, the per-query persists in the
    // dedup family accumulate for the JVM lifetime of the 93-query run,
    // evicting hot data and spilling (measured round 4: d8 2.5→10 s,
    // m1 3→10 s from cache-pressure alone). The clear runs OUTSIDE the
    // timed region: a real pipeline would unpersist when its job ends.
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // Failures must be VISIBLE, not silently timed: a broken query's
    // time-to-exception must neither appear as its per-query number nor
    // contribute to the headline total — only successful passes count.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timedPass(): Map[String, Double] =
      queries.flatMap { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => failed += name; false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) Some(name -> dt) else None
      }
    val p1 = timedPass()
    val p2 = timedPass()
    val results = scala.collection.immutable.ListMap(
      queries.keys.flatMap(k => (p1.get(k), p2.get(k)) match {
        case (Some(a), Some(b)) => Some(k -> math.min(a, b))
        case (a, b)             => a.orElse(b).map(k -> _)
      }).toSeq: _*)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // The driver's BENCH artifact preserves only a ~2.2 KB stdout tail,
    // which truncates the per-query map once the registry outgrows it
    // (round 6 lost 85/144 timings). Persist the COMPLETE machine-readable
    // result to a file (committed per round as BENCH_LOCAL_r{N}.json) so
    // round-over-round comparisons never degrade; the same JSON is still
    // printed as the very last stdout line so the tail captures its end.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
