package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class ZipContainerSpec extends AnyFunSuite {
  import ZipContainer._

  private def m(name: String, s: String) = Member(name, s.getBytes("UTF-8"))

  test("round-trips members in order, bit-exact") {
    val in = Seq(m("doc.txt", "the quick brown fox"),
      m("meta.json", """{"id":7,"n":19}"""), m("empty.bin", ""))
    val out = read(build(in))
    assert(out.map(_.name) == in.map(_.name))
    assert(out.zip(in).forall { case (a, b) => a.bytes.sameElements(b.bytes) })
  }

  test("output bytes are deterministic (fixed timestamps)") {
    val in = Seq(m("a", "alpha beta gamma delta " * 40), m("b", "x"))
    assert(build(in).sameElements(build(in)))
  }

  test("DEFLATE actually compresses repetitive payloads") {
    val payload = "token stream repeats " * 200
    val zip = build(Seq(m("doc.txt", payload)))
    assert(zip.length < payload.getBytes("UTF-8").length / 4,
      s"expected real compression, got ${zip.length} bytes for ${payload.length}")
  }

  test("read verifies stored CRC-32: corrupt payload throws") {
    val zip = build(Seq(m("doc.txt", "a b c d e f g h i j k l m n o p" * 8)))
    // flip a bit inside the compressed payload region (past the 30-byte
    // local header + name) — either inflate or the CRC check must reject
    val bad = zip.clone()
    bad(40) = (bad(40) ^ 0x55).toByte
    intercept[Exception](read(bad))
  }

  test("crc32 matches java.util.zip on a known vector") {
    // CRC-32 of "123456789" is the standard check value 0xCBF43926
    assert(crc32("123456789".getBytes("UTF-8")) == 0xCBF43926L)
  }
}
