package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom typed-buffer aggregate: deterministic bounded group sample.
  *
  * Keeps the `k` rows with the smallest `(hash, value)` pairs per
  * group — a KMV (k-minimum-values) bottom-k sketch. With a universal
  * hash of the value as the sort key this is a uniform-without-
  * replacement sample that is deterministic, mergeable (union +
  * truncate), and O(k) state per group — unlike the
  * `row_number() OVER (ORDER BY rand())` idiom, which shuffles and
  * sorts every row of every group. The same construction yields
  * distinct-count estimates (KMV estimator) at scale.
  *
  * Aggregation-buffer contract (`TypedImperativeAggregate`): the
  * buffer is an insertion-bounded pair list serialized as longs;
  * `update` inserts one (hash, value), `merge` unions two sketches,
  * `eval` emits the values ordered by (hash, value) ascending as
  * `array<bigint>`.
  *
  * Value and hash are LongType (ids and integer-hash domains); the
  * hash is an arbitrary caller expression, e.g. the ANSI-safe
  * universal hash `(a*x + b) % p` — exactly reproducible in an
  * external SQL oracle, unlike engine-internal hash functions.
  *
  * `dedup = true` turns the sample into a proper KMV distinct-value
  * sketch: an exact duplicate `(hash, value)` pair is inserted once,
  * so the buffer holds the k smallest pairs over the DISTINCT input
  * multiset — the form the KMV distinct-count estimator
  * `(k-1)·|H| / h_(k)` requires. (The default keeps duplicates: a
  * bounded uniform sample of ROWS, where repeated values are
  * legitimately more likely to be drawn.)
  */
case class BottomKByHash(value: Expression, hash: Expression, k: Int,
                         dedup: Boolean = false,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKByHash.Buffer] {

  import BottomKByHash.Buffer

  override def children: Seq[Expression] = Seq(value, hash)

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && hash.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bottomk expects (bigint value, bigint hash, k>0); " +
        s"got ${value.dataType}/${hash.dataType}/k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buffer = new Buffer(k, dedup)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = value.eval(input)
    val h = hash.eval(input)
    if (v != null && h != null) b.insert(h.asInstanceOf[Long], v.asInstanceOf[Long])
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = { b.mergeIn(other); b }

  override def eval(b: Buffer): Any = new GenericArrayData(b.sortedValues)

  override def serialize(b: Buffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.deserialize(k, dedup, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(value = newChildren(0), hash = newChildren(1))

  override def prettyName: String =
    if (dedup) "graft_bottomk_distinct" else "graft_bottomk"
}

object BottomKByHash {

  /** Bounded (hash, value) pair list ordered by (hash, value) asc; at
    * most k pairs retained. With `dedup = false` duplicates (same hash
    * AND value) are kept — a row sample; with `dedup = true` each
    * distinct pair is stored once — a KMV distinct-value sketch.
    * Ties across distinct values are resolved by the value ordering. */
  final class Buffer(k: Int, dedup: Boolean = false) {
    // flat sorted arrays — k is small (a sample size), linear insert is
    // cache-friendly and trivially serializable
    private var n = 0
    private val hs = new Array[Long](k)
    private val vs = new Array[Long](k)

    private def lessThan(h: Long, v: Long, i: Int): Boolean =
      h < hs(i) || (h == hs(i) && v < vs(i))

    private def contains(h: Long, v: Long): Boolean = {
      var i = 0
      while (i < n && (hs(i) < h || (hs(i) == h && vs(i) < v))) i += 1
      i < n && hs(i) == h && vs(i) == v
    }

    def insert(h: Long, v: Long): Unit = {
      if (n == k && !lessThan(h, v, n - 1)) return
      if (dedup && contains(h, v)) return
      var i = if (n == k) n - 1 else n
      if (n < k) n += 1
      while (i > 0 && lessThan(h, v, i - 1)) {
        hs(i) = hs(i - 1); vs(i) = vs(i - 1); i -= 1
      }
      hs(i) = h; vs(i) = v
    }

    def mergeIn(other: Buffer): Unit = {
      var i = 0
      while (i < other.n) { insert(other.hs(i), other.vs(i)); i += 1 }
    }

    def sortedValues: Array[Long] = java.util.Arrays.copyOfRange(vs, 0, n)

    def serialize(): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putLong(hs(i)); bb.putLong(vs(i)); i += 1 }
      bb.array()
    }
  }

  object Buffer {
    def deserialize(k: Int, dedup: Boolean, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val b = new Buffer(k, dedup)
      val n = bb.getInt
      var i = 0
      while (i < n) { val h = bb.getLong; val v = bb.getLong; b.insert(h, v); i += 1 }
      b
    }
  }
}
