package graft

import graft.ops.Hashing
import org.scalatest.funsuite.AnyFunSuite

class HashingSpec extends AnyFunSuite {
  test("md5 hex matches the RFC 1321 test vectors (and so Spark/DuckDB md5())") {
    val md5 = Hashing.newMd5()
    assert(md5.hex("") == "d41d8cd98f00b204e9800998ecf8427e")
    assert(md5.hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
    assert(md5.hex("message digest") == "f96b697d7cb7938d525a2f31aaf161d0")
    // stateful reuse: digest resets between calls
    assert(md5.hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }
}
