package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMING $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toksC = filter(split(col("text"), " "), x => x =!= "")
    val shsC = array_distinct(
      when(size(toksC) >= 3,
        transform(sequence(lit(0), size(toksC) - 3),
          j => concat_ws(" ", element_at(toksC, j + 1),
            element_at(toksC, j + 2), element_at(toksC, j + 3))))
        .otherwise(array().cast("array<string>")))
    val ex = docs.select(col("doc_id"), size(shsC).as("nsh"), explode(shsC).as("sh"))
    time("explode-count")(ex.count())
    val aggs = (0 until 8).map(i => min(md5(concat(col("sh"), lit(s"|$i")))).as(s"mh$i"))
    val sigs = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    time("sigs")(sigs.count())
    val sigsC = sigs.cache()
    time("sigs-cached")(sigsC.count())
    val bands = sigsC.select(col("doc_id"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band_idx"),
          md5(concat(col(s"mh${2 * j}"), col(s"mh${2 * j + 1}"))).as("band_key"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_key"))
    time("bands")(bands.count())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("cand")(cand.count())
    val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("na"), col("sh"))
    val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("nb"), col("sh"))
    val fin = cand.join(a, Seq("doc_a")).join(b, Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("shared"))
    time("final")(fin.count())
    spark.stop()
  }
}
