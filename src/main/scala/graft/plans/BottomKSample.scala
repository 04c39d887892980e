package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Deterministic bottom-k sample: keeps the k ids with the smallest
  * `mix(id)` where `mix(id) = (id * 2654435761) mod 1000000007`
  * (tiebreak on id). Min-k over a deterministic key is a semilattice —
  * merge order, partitioning and retry count can never change the
  * result, which is what makes this the reproducible per-group sampling
  * primitive for a 1000-executor pipeline (a `rand()` sample is not).
  *
  * Implementation: `TypedImperativeAggregate` over a bounded binary
  * max-heap of mixed keys (O(k) memory per group, O(log k) update).
  * The same mix is plain integer arithmetic, so any SQL engine can
  * replicate the exact sample for verification.
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSample.Heap] {

  import BottomKSample._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bottomk_sample expects a bigint id column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bottomk_sample"

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Heap, other: Heap): Heap = { buf.absorb(other); buf }

  override def eval(buf: Heap): Any = new GenericArrayData(buf.sortedIds)

  override def serialize(buf: Heap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Heap = Heap.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object BottomKSample {

  val MixMul = 2654435761L
  val MixMod = 1000000007L

  def mix(id: Long): Long = {
    val m = (id * MixMul) % MixMod
    if (m < 0) m + MixMod else m
  }

  /** Bounded max-heap over (mixKey, id); keeps the k smallest. Ordering
    * is (mixKey, id) lexicographic so duplicates/ties are deterministic. */
  final class Heap(k: Int) {
    // heap of packed comparables: we compare (key, id) pairs
    private var keys = new Array[Long](k)
    private var ids = new Array[Long](k)
    private var n = 0

    private def less(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 < i2)

    def offer(id: Long): Unit = {
      val key = mix(id)
      if (n < k) {
        keys(n) = key; ids(n) = id; n += 1
        siftUp(n - 1)
      } else if (k > 0 && less(key, id, keys(0), ids(0))) {
        keys(0) = key; ids(0) = id
        siftDown(0)
      }
    }

    def absorb(other: Heap): Unit = {
      var i = 0
      while (i < other.n) { offer(other.ids(i)); i += 1 }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (less(keys(p), ids(p), keys(i), ids(i))) {
          swap(i, p); i = p
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && less(keys(m), ids(m), keys(l), ids(l))) m = l
        if (r < n && less(keys(m), ids(m), keys(r), ids(r))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    /** ids ordered by (mixKey, id) ascending — the canonical sample. */
    def sortedIds: Array[Long] =
      (0 until n).map(i => (keys(i), ids(i))).sorted.map(_._2).toArray

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(bytes: Array[Byte], k: Int): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val h = new Heap(k)
      val n = bb.getInt
      var i = 0
      while (i < n) { h.offer(bb.getLong); i += 1 }
      h
    }
  }
}
