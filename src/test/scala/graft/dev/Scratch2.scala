package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        System.getProperty("java.io.tmpdir") + "/graft_warehouse")
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
    val sets = docs.select(col("doc_id"), shsC.as("shs"))
    val ex = sets.select(col("doc_id"), size(col("shs")).as("nsh"),
      explode(col("shs")).as("sh"))
    // simulate cand with a literal small pair set from d3 planted dups
    val a = ex.select(col("doc_id").as("doc_a"), col("nsh").as("na"), col("sh"))
    val b = ex.select(col("doc_id").as("doc_b"), col("nsh").as("nb"), col("sh"))
    time("d3-style-join") {
      a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(count(lit(1)).as("shared")).count()
    }
    // cheap shingling alternative: tokens via posexplode + window lead
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), posexplode(toksC).as(Seq("pos", "w")))
    val wn = Window.partitionBy("doc_id").orderBy("pos")
    val sh2 = toks
      .withColumn("w2", lead("w", 1).over(wn))
      .withColumn("w3", lead("w", 2).over(wn))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w2"), col("w3")).as("sh"))
      .distinct()
    time("shingle-via-window")(sh2.count())
    time("shingle-via-hof")(ex.count())
    time("shingle-via-hof-again")(ex.count())
    spark.stop()
  }
}
