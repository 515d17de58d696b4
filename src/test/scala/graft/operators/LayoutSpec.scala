package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonKey: classic interleave values, masking, positivity") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (5L, 3L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (-1L, -1L)).toDF("a", "b")
    val got = rows.select(Layout.mortonKey(col("a"), col("b"))).as[Long].collect()
    // morton(3,5): x bits {0,1}→bits 0,2 = 5; y bits {0,2}→bits 1,5 = 34
    assert(got.take(5).toSeq == Seq(0L, 1L, 2L, 39L, 27L))
    // full 31-bit keys interleave to the max 62-bit value, still positive
    assert(got(5) == (1L << 62) - 1)
    // negative inputs are masked to their low 31 bits, not sign-extended
    assert(got(6) == got(5) && got.forall(_ >= 0))
  }

  test("mortonKey is monotone within a fixed second dimension") {
    val df = (0L until 64L).map(a => (a, 7L)).toDF("a", "b")
    val keys = df.select(Layout.mortonKey(col("a"), col("b"))).as[Long].collect()
    assert(keys.toSeq == keys.sorted.toSeq, "fixed b ⇒ z increases with a")
  }

  test("zorderedParquet: files cover disjoint z ranges, both-column stats tighten") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val rnd = new scala.util.Random(13)
    val df = (1 to 4000)
      .map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong, rnd.nextInt()))
      .toDF("a", "b", "v")
    Layout.zorderedParquet(df, s"$dir/z", "a", "b", numFiles = 8)
    val files = new java.io.File(s"$dir/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length == 8)
    // recompute each file's z range: ranges must be pairwise disjoint
    // (repartitionByRange + in-partition sort ⇒ the curve is cut into
    // consecutive segments)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .select(Layout.mortonKey(col("a"), col("b")).as("z"))
        .agg(min("z"), max("z")).head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlapping z ranges")
      case _ =>
    }
    // the layout must tighten per-file spans on BOTH raw columns vs the
    // global span — that's what makes min/max skipping work on each axis
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(min("a"), max("a"), min("b"), max("b")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    val avgA = spans.map(_._1).sum.toDouble / spans.length
    val avgB = spans.map(_._2).sum.toDouble / spans.length
    assert(avgA < 999 * 0.8 && avgB < 999 * 0.8,
      s"z-order should tighten per-file spans, got avgA=$avgA avgB=$avgB")
    assert(spark.read.parquet(s"$dir/z").count() == 4000)
  }
}
