package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-real PNG header decoding as pure codegen'd SQL expressions
  * over a binary column — no UDF, no driver: `substring` on binary +
  * `hex` + base-16 `conv` implement the actual big-endian field reads
  * of the PNG wire format (signature 89 50 4E 47 0D 0A 1A 0A at bytes
  * 1-8, IHDR chunk at 13-16, width/height as unsigned be32 at 17-20 /
  * 21-24, bit depth at 25, color type at 26). Works on any real PNG
  * byte stream — ImageHeaderSpec proves it on a canonical real-world
  * PNG header; the mm4 registry row proves the arithmetic
  * hash-exactly against an independent oracle.
  */
object ImageHeader {

  /** Hex of the 8-byte PNG signature. */
  val pngMagicHex = "89504E470D0A1A0A"

  /** True when the payload starts with the PNG signature (byte-exact:
    * 0x89 cannot occur in ASCII text, so no false positives on raw
    * text payloads).
    */
  def isPng(payload: Column): Column =
    hex(substring(payload, 1, 8)) === lit(pngMagicHex)

  /** Unsigned big-endian 32-bit field at 1-indexed byte offset. */
  private def be32(payload: Column, pos: Int): Column =
    conv(hex(substring(payload, pos, 4)), 16, 10).cast("int")

  /** Single byte at 1-indexed offset as an int. */
  private def u8(payload: Column, pos: Int): Column =
    conv(hex(substring(payload, pos, 1)), 16, 10).cast("int")

  def width(payload: Column): Column = be32(payload, 17)
  def height(payload: Column): Column = be32(payload, 21)
  def bitDepth(payload: Column): Column = u8(payload, 25)
  def colorType(payload: Column): Column = u8(payload, 26)

  /** Channel count from the PNG color type (0 gray, 2 truecolor,
    * 3 palette, 4 gray+alpha, 6 RGBA).
    */
  def channels(payload: Column): Column = {
    val ct = colorType(payload)
    when(ct === 0, 1).when(ct === 2, 3).when(ct === 3, 1)
      .when(ct === 4, 2).when(ct === 6, 4)
  }
}
