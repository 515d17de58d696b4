package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class WarcRecordsSpec extends AnyFunSuite {
  import WarcRecords._

  private def rec(t: String, id: String, p: String) =
    Record(Seq("WARC-Type" -> t, "WARC-Record-ID" -> id),
      p.getBytes("UTF-8"))

  test("round-trips records in order with exact payloads") {
    val in = Seq(rec("warcinfo", "urn:a", "k=v\n"),
      rec("response", "urn:b", "the payload body"))
    val out = parse(build(in))
    assert(out.map(_.header("WARC-Record-ID").get) == Seq("urn:a", "urn:b"))
    assert(out.zip(in).forall { case (a, b) =>
      a.payload.sameElements(b.payload) })
  }

  test("Content-Length framing survives boundary-looking payload bytes") {
    // payload contains a fake record terminator AND a fake version line
    val tricky = "x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\ny"
    val out = parse(build(Seq(rec("response", "urn:t", tricky))))
    assert(out.length == 1)
    assert(new String(out.head.payload, "UTF-8") == tricky)
  }

  test("empty payload and case-insensitive header lookup") {
    val out = parse(build(Seq(rec("metadata", "urn:e", ""))))
    assert(out.head.payload.isEmpty)
    assert(out.head.header("warc-type").contains("metadata"))
    assert(out.head.header("CONTENT-LENGTH").contains("0"))
  }

  test("truncated payload and bad terminator throw") {
    val ok = build(Seq(rec("response", "urn:x", "0123456789")))
    intercept[java.io.IOException](parse(ok.dropRight(6)))
    val bad = ok.clone()
    bad(bad.length - 1) = 'X'.toByte
    intercept[java.io.IOException](parse(bad))
  }

  test("build rejects caller-supplied Content-Length") {
    intercept[IllegalArgumentException](build(Seq(
      Record(Seq("Content-Length" -> "3"), "abc".getBytes))))
  }
}
