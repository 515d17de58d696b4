package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}

/** ZIP container codec for archive-packaged corpora (the
  * many-small-files-in-one-archive layout Common-Crawl-style dumps and
  * annotation drops arrive in). Pure JVM (`java.util.zip` — real
  * DEFLATE), deterministic output (fixed entry timestamps, fixed member
  * order), and CRC-verifying on read: `ZipInputStream` recomputes each
  * member's CRC-32 against the stored value, so a decode that returns
  * is a decode that round-tripped bit-exactly.
  *
  * Scale shape: each archive is one opaque binary cell processed
  * row-locally inside the task that holds it (mapPartitions /
  * per-row codec calls) — no shuffle, no driver involvement; archives
  * parallelize across partitions like any other binary column.
  */
object ZipContainer extends Serializable {

  final case class Member(name: String, bytes: Array[Byte])

  /** Deterministic epoch timestamp for entries: ZIP stores local DOS
    * time, so a varying clock would make byte output nondeterministic.
    * 2000-01-01T00:00:00 UTC is representable in DOS time (epochs
    * before 1980 are not). */
  private val FixedTimeMs = 946684800000L

  /** Build a ZIP archive holding `members` in the given order, every
    * entry DEFLATE-compressed at the default level with a fixed
    * timestamp — same members in, same bytes out, on any JVM. */
  def build(members: Seq[Member]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(256)
    val zos = new ZipOutputStream(bos)
    members.foreach { m =>
      val e = new ZipEntry(m.name)
      e.setTime(FixedTimeMs)
      zos.putNextEntry(e)
      zos.write(m.bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Read every member of a ZIP archive, in archive order.
    * `ZipInputStream` verifies each entry's stored CRC-32 as a side
    * effect of reaching the entry end (throws `ZipException` on
    * mismatch), so returned members are integrity-checked. */
  def read(bytes: Array[Byte]): Seq[Member] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[Member]
    val buf = new Array[Byte](4096)
    var e = zis.getNextEntry
    while (e != null) {
      val acc = new ByteArrayOutputStream(256)
      var n = zis.read(buf)
      while (n >= 0) { acc.write(buf, 0, n); n = zis.read(buf) }
      out += Member(e.getName, acc.toByteArray)
      zis.closeEntry()
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
  }

  /** CRC-32 of a byte payload (for independent spot checks in specs —
    * the read path already verifies stored CRCs). */
  def crc32(bytes: Array[Byte]): Long = {
    val c = new CRC32
    c.update(bytes)
    c.getValue
  }
}
