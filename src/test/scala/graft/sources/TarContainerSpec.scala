package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class TarContainerSpec extends AnyFunSuite {
  import TarContainer._

  private def m(name: String, s: String) = Member(name, s.getBytes("UTF-8"))

  test("tar round-trips members in order, bit-exact") {
    val in = Seq(m("doc.txt", "the quick brown fox jumped"),
      m("meta.json", """{"id":7,"n":26}"""), m("empty.txt", ""))
    val out = read(build(in))
    assert(out.map(_.name) == in.map(_.name))
    assert(out.zip(in).forall { case (a, b) => a.bytes.sameElements(b.bytes) })
  }

  test("archive bytes are deterministic and block-aligned") {
    val in = Seq(m("a.txt", "alpha " * 100), m("b.txt", "z"))
    val t1 = build(in)
    assert(t1.sameElements(build(in)))
    assert(t1.length % 512 == 0)
  }

  test("header checksum is verified: corrupt header throws") {
    val t = build(Seq(m("doc.txt", "payload bytes here")))
    val bad = t.clone()
    bad(0) = 'X'.toByte // flip a name byte -> checksum mismatch
    val e = intercept[java.io.IOException](read(bad))
    assert(e.getMessage.contains("checksum"))
  }

  test("header fields follow ustar layout") {
    val t = build(Seq(m("doc.txt", "abc")))
    assert(new String(t, 257, 5, "US-ASCII") == "ustar")
    assert(t(262) == 0)                              // magic NUL
    assert(new String(t, 263, 2, "US-ASCII") == "00") // version
    assert(t(156) == '0')                            // regular file
    // size[12]: 3 bytes -> octal "00000000003"
    assert(new String(t, 124, 11, "US-ASCII") == "00000000003")
  }

  test("tar.gz wrap round-trips and compresses") {
    val in = Seq(m("doc.txt", "token stream repeats " * 200))
    val tar = build(in)
    val gz = gzip(tar)
    assert(gz.length < tar.length / 4, s"gzip ${gz.length} vs tar ${tar.length}")
    val out = read(gunzip(gz))
    assert(out.head.bytes.sameElements(in.head.bytes))
  }
}
