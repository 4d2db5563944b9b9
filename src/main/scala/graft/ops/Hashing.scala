package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Engine-portable hashing: lowercase-hex md5 identical to Spark's
  * `md5()` and DuckDB's `md5()`, for use inside typed kernels. A
  * MessageDigest instance is NOT thread-safe — create one per
  * partition (see [[withMd5]]).
  */
object Hashing {
  private val hexChars = "0123456789abcdef".toCharArray

  final class Md5 {
    private val md = MessageDigest.getInstance("MD5")
    def hex(s: String): String = {
      val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
        out(2 * i + 1) = hexChars(bytes(i) & 0xf)
        i += 1
      }
      new String(out)
    }
  }

  /** One digest per partition: `it => { val md5 = Hashing.newMd5(); ... }` */
  def newMd5(): Md5 = new Md5
}
