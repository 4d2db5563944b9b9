package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the d7 candidate pipeline. */
object D7Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    val ex = docs.mapPartitions(_.flatMap { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Iterator.empty
      else {
        val shs = toks.sliding(3).map(_.mkString(" ")).toSet
        shs.iterator.map(sh => graft.queries.ShingleRow(id, shs.size, sh))
      }
    }).toDF()
    time("ex")(ex.count())
    val postings = ex.groupBy("sh")
      .agg(array_sort(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")).between(2, 10))
    time("postings")(postings.count())
    val pairs = postings
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
    time("pairs")(pairs.count())
    val cand = pairs.select(col("p.doc_a"), col("p.doc_b")).distinct()
    time("cand")(cand.count())
    val sets = docs.mapPartitions(_.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val shs =
        if (toks.length < 3) Seq.empty[String]
        else toks.sliding(3).map(_.mkString(" ")).toSet.toSeq
      graft.queries.DocSet(id, shs.size, shs)
    }).toDF()
    val a = sets.select(col("doc_id").as("doc_a"), col("nsh").as("na"),
      col("shs").as("shs_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("nsh").as("nb"),
      col("shs").as("shs_b"))
    val joined = cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
    time("joined")(joined.count())
    val verified = joined
      .withColumn("shared", size(array_intersect(col("shs_a"), col("shs_b"))))
      .withColumn("jaccard", round(col("shared").cast("double")
        / (col("na") + col("nb") - col("shared")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
    time("verified")(verified.count())
    time("raw_intersect")(
      joined.selectExpr("sum(size(array_intersect(shs_a, shs_b))) AS s")
        .collect()(0).getLong(0))
    // alternative: exact shared counts from the inverted index restricted
    // to candidate docs (no per-pair array intersection)
    val exAll = ex.select(col("doc_id"), col("nsh"), col("sh"))
    val sa = exAll.select(col("doc_id").as("doc_a"), col("nsh").as("na"),
      col("sh"))
    val sb = exAll.select(col("doc_id").as("doc_b"), col("nsh").as("nb"),
      col("sh"))
    val stats = sa.join(sb, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("shared"))
    val verified2 = cand.join(stats, Seq("doc_a", "doc_b"))
      .withColumn("jaccard", round(col("shared").cast("double")
        / (col("na") + col("nb") - col("shared")), 4))
      .filter(col("jaccard") >= 0.5)
    time("verified_invidx")(verified2.count())
    spark.stop()
  }
}
