package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** USTAR (POSIX.1-1988 tar) container codec plus gzip wrapping — the
  * `.tar.gz` corpus-drop layout. Pure JVM, written to the published
  * header format: 512-byte blocks, octal size/mtime fields, and the
  * 8-byte header checksum (sum of header bytes with the checksum field
  * read as spaces) which [[read]] VERIFIES per entry — a corrupted
  * header fails the decode, not just a spec. Deterministic output:
  * fixed mtime/mode/uid/gid, member order preserved, so same members
  * in → same bytes out on any JVM.
  *
  * Scale shape: archives are row-local binary cells (encode + decode
  * run inside the task holding the row) — no shuffle, no driver;
  * embarrassingly parallel across partitions.
  */
object TarContainer extends Serializable {

  final case class Member(name: String, bytes: Array[Byte])

  private val Block = 512
  /** 2000-01-01T00:00:00Z — fixed so archive bytes are reproducible. */
  private val FixedMtime = 946684800L

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, zero-padded, NUL-terminated (ustar style)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  private def putString(dst: Array[Byte], off: Int, s: String): Unit = {
    val b = s.getBytes("US-ASCII")
    System.arraycopy(b, 0, dst, off, b.length)
  }

  private def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("US-ASCII").length <= 100,
      s"ustar name limit is 100 bytes: $name")
    val h = new Array[Byte](Block)
    putString(h, 0, name)                          // name[100]
    System.arraycopy(octal(420L, 8), 0, h, 100, 8) // mode[8] = 0644
    System.arraycopy(octal(0L, 8), 0, h, 108, 8)   // uid[8]
    System.arraycopy(octal(0L, 8), 0, h, 116, 8)   // gid[8]
    System.arraycopy(octal(size, 12), 0, h, 124, 12)       // size[12]
    System.arraycopy(octal(FixedMtime, 12), 0, h, 136, 12) // mtime[12]
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum[8] as spaces
    h(156) = '0'                                   // typeflag: regular file
    putString(h, 257, "ustar\u0000")        // magic[6] = "ustar\\0"
    putString(h, 263, "00")                   // version[2]
    val sum = h.map(_ & 0xff).sum.toLong
    // checksum: 6 octal digits, NUL, space
    System.arraycopy(octal(sum, 7), 0, h, 148, 7)
    h(155) = ' '.toByte
    h
  }

  /** Build an uncompressed USTAR archive (member order preserved,
    * payloads padded to 512, two zero end blocks). */
  def build(members: Seq[Member]): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    members.foreach { m =>
      out.write(header(m.name, m.bytes.length.toLong))
      out.write(m.bytes)
      val rem = m.bytes.length % Block
      if (rem != 0) out.write(new Array[Byte](Block - rem))
    }
    out.write(new Array[Byte](2 * Block))
    out.toByteArray
  }

  /** Parse a USTAR archive, VERIFYING each header checksum. */
  def read(bytes: Array[Byte]): Seq[Member] = {
    val out = Seq.newBuilder[Member]
    var off = 0
    var done = false
    while (!done && off + Block <= bytes.length) {
      val h = java.util.Arrays.copyOfRange(bytes, off, off + Block)
      if (h.forall(_ == 0)) done = true // end-of-archive zero block
      else {
        val stored = new String(h, 148, 8, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        java.util.Arrays.fill(h, 148, 156, ' '.toByte)
        val computed = h.map(_ & 0xff).sum.toLong
        val storedV = java.lang.Long.parseLong(stored.trim, 8)
        if (storedV != computed)
          throw new java.io.IOException(
            s"tar header checksum mismatch at offset $off: " +
              s"stored $storedV computed $computed")
        val name = new String(h, 0, 100, "US-ASCII").takeWhile(_ != '\u0000')
        val size = java.lang.Long.parseLong(
          new String(h, 124, 12, "US-ASCII").trim.takeWhile(_ != '\u0000'), 8)
        val dataOff = off + Block
        out += Member(name, java.util.Arrays.copyOfRange(
          bytes, dataOff, dataOff + size.toInt))
        val padded = ((size + Block - 1) / Block) * Block
        off = dataOff + padded.toInt
      }
    }
    out.result()
  }

  /** gzip wrap/unwrap (real DEFLATE, `java.util.zip`). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val g = new GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val g = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val acc = new ByteArrayOutputStream(bytes.length * 2 + 64)
    val buf = new Array[Byte](4096)
    var n = g.read(buf)
    while (n >= 0) { acc.write(buf, 0, n); n = g.read(buf) }
    g.close()
    acc.toByteArray
  }
}
