package graft

import graft.ops.ImageHeader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The mm4 decoder against REAL PNG bytes: the leading 26 bytes of
  * every 1×1 RGBA PNG in the wild are exactly the signature + IHDR
  * header below (RFC 2083 layout), so parsing them with the pure-SQL
  * expressions proves the decoder reads the actual wire format — not
  * just the testdata construction.
  */
class ImageHeaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.warehouse.dir",
      System.getProperty("java.io.tmpdir") + "/graft_warehouse")
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .appName("image-header-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def parse(payload: Array[Byte]) = {
    import spark.implicits._
    Seq(payload).toDF("payload")
      .select(ImageHeader.isPng(col("payload")).as("is_png"),
        ImageHeader.width(col("payload")).as("w"),
        ImageHeader.height(col("payload")).as("h"),
        ImageHeader.bitDepth(col("payload")).as("bd"),
        ImageHeader.channels(col("payload")).as("ch"))
      .first()
  }

  test("parses the canonical 1x1 RGBA PNG header byte-for-byte") {
    val header = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d,                         // IHDR length 13
      0x49, 0x48, 0x44, 0x52,                         // "IHDR"
      0x00, 0x00, 0x00, 0x01,                         // width 1
      0x00, 0x00, 0x00, 0x01,                         // height 1
      0x08, 0x06                                      // depth 8, RGBA
    ).map(_.toByte)
    val r = parse(header)
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 1 && r.getInt(2) == 1)
    assert(r.getInt(3) == 8 && r.getInt(4) == 4)
  }

  test("parses multi-byte big-endian dimensions (1920x1080 truecolor)") {
    val header = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d,
      0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x07, 0x80,                         // width 1920
      0x00, 0x00, 0x04, 0x38,                         // height 1080
      0x08, 0x02                                      // depth 8, RGB
    ).map(_.toByte)
    val r = parse(header)
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 1920 && r.getInt(2) == 1080)
    assert(r.getInt(3) == 8 && r.getInt(4) == 3)
  }

  test("rejects non-PNG payloads on the signature check") {
    val r = parse("hello, definitely not a png".getBytes("US-ASCII"))
    assert(!r.getBoolean(0))
  }
}
