package graft.dev
import org.apache.spark.sql.SparkSession

/** Dev-only: write `explain("formatted")` for selected registry
  * queries to files — the round-17 optimization evidence trail
  * (`plans/r17/<query>_{before,after}.txt`).
  * usage: Test/runMain graft.dev.PlanDump <sfDir> <outDir> <suffix> <query>...
  * NOTE: driver-loop queries (streaming proofs, k-means/BPE training)
  * execute their loop jobs during construction; their dumped plan is
  * the final returned DataFrame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"PLANDUMP wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
