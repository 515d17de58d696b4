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
  */
case class BottomKByHash(value: Expression, hash: Expression, k: Int,
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

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(b: Buffer, input: InternalRow): Buffer = {
    val v = value.eval(input)
    val h = hash.eval(input)
    if (v != null && h != null) b.insert(h.asInstanceOf[Long], v.asInstanceOf[Long])
    b
  }

  override def merge(b: Buffer, other: Buffer): Buffer = { b.mergeIn(other); b }

  override def eval(b: Buffer): Any = new GenericArrayData(b.sortedValues)

  override def serialize(b: Buffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(value = newChildren(0), hash = newChildren(1))

  override def prettyName: String = "graft_bottomk"
}

object BottomKByHash {

  /** Bounded (hash, value) pair set ordered by (hash, value) asc; at
    * most k pairs retained, duplicates (same hash AND value) kept —
    * ties across distinct values are resolved by the value ordering. */
  final class Buffer(k: Int) {
    // flat sorted arrays — k is small (a sample size), linear insert is
    // cache-friendly and trivially serializable
    private var n = 0
    private val hs = new Array[Long](k)
    private val vs = new Array[Long](k)

    private def lessThan(h: Long, v: Long, i: Int): Boolean =
      h < hs(i) || (h == hs(i) && v < vs(i))

    def insert(h: Long, v: Long): Unit = {
      if (n == k && !lessThan(h, v, n - 1)) return
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
    def deserialize(k: Int, bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val b = new Buffer(k)
      val n = bb.getInt
      var i = 0
      while (i < n) { val h = bb.getLong; val v = bb.getLong; b.insert(h, v); i += 1 }
      b
    }
  }
}
