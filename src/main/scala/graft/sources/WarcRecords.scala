package graft.sources

/** WARC/1.0 record codec (ISO 28500 — the Web-ARChive format Common
  * Crawl ships, i.e. THE container LLM text corpora start from). A
  * record is: a version line, CRLF-separated named headers (with
  * `Content-Length` giving the exact payload byte count), one blank
  * line, the payload, and a CRLF CRLF record terminator; a WARC file is
  * records concatenated. This codec writes and parses that published
  * framing — Content-Length-driven (payloads may contain anything,
  * including things that look like record boundaries), header names
  * case-insensitive per spec, strict CRLF discipline on read (a
  * malformed terminator or a short payload throws rather than
  * resyncing).
  *
  * Scale shape: files split at record boundaries; here records are
  * row-local binary cells — encode+parse run inside the task holding
  * the row, zero shuffles, no driver.
  */
object WarcRecords extends Serializable {

  final case class Record(headers: Seq[(String, String)],
                          payload: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  private val Crlf = "\r\n"
  private val Version = "WARC/1.0"

  /** Serialize records into one WARC stream. `Content-Length` is
    * computed here (callers never hand-maintain it). */
  def build(records: Seq[Record]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    records.foreach { r =>
      val sb = new StringBuilder
      sb.append(Version).append(Crlf)
      r.headers.foreach { case (k, v) =>
        require(!k.equalsIgnoreCase("Content-Length"),
          "Content-Length is computed by build()")
        sb.append(k).append(": ").append(v).append(Crlf)
      }
      sb.append("Content-Length: ").append(r.payload.length).append(Crlf)
      sb.append(Crlf)
      out.write(sb.toString.getBytes("US-ASCII"))
      out.write(r.payload)
      out.write((Crlf + Crlf).getBytes("US-ASCII"))
    }
    out.toByteArray
  }

  /** Parse a WARC stream into records. Content-Length-driven; strict:
    * bad version line, missing Content-Length, short payload, or a
    * missing record terminator each throw. */
  def parse(bytes: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var off = 0
    def line(): String = {
      val start = off
      while (off + 1 < bytes.length &&
             !(bytes(off) == '\r' && bytes(off + 1) == '\n')) off += 1
      if (off + 1 >= bytes.length)
        throw new java.io.IOException(s"unterminated line at offset $start")
      val s = new String(bytes, start, off - start, "UTF-8")
      off += 2
      s
    }
    while (off < bytes.length) {
      val v = line()
      if (!v.startsWith("WARC/"))
        throw new java.io.IOException(s"bad WARC version line: '$v'")
      val hdrs = Seq.newBuilder[(String, String)]
      var l = line()
      while (l.nonEmpty) {
        val i = l.indexOf(':')
        if (i < 0) throw new java.io.IOException(s"bad header line: '$l'")
        hdrs += l.substring(0, i).trim -> l.substring(i + 1).trim
        l = line()
      }
      val rec = Record(hdrs.result(), Array.emptyByteArray)
      val len = rec.header("Content-Length").map(_.toInt).getOrElse(
        throw new java.io.IOException("missing Content-Length"))
      if (off + len > bytes.length)
        throw new java.io.IOException(
          s"payload truncated: need $len bytes at offset $off")
      val payload = java.util.Arrays.copyOfRange(bytes, off, off + len)
      off += len
      val term = new Array[Byte](4)
      if (off + 4 > bytes.length)
        throw new java.io.IOException("missing record terminator")
      System.arraycopy(bytes, off, term, 0, 4)
      if (!(term(0) == '\r' && term(1) == '\n' &&
            term(2) == '\r' && term(3) == '\n'))
        throw new java.io.IOException(
          s"bad record terminator at offset $off")
      off += 4
      out += rec.copy(payload = payload)
    }
    out.result()
  }
}
