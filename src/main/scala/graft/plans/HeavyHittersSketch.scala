package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Misra-Gries heavy-hitters summary as a mergeable aggregate.
  *
  * The classic mergeable-summaries construction (Agarwal et al., PODS
  * 2012): a counter table of at most `capacity` items. Update: hit →
  * +1; miss with room → insert 1; miss when full → decrement ALL
  * counters (drop zeros). Merge: add matching counters, then subtract
  * the (capacity+1)-th largest count from everything and drop ≤0 —
  * closed under merging, so partial aggregation and arbitrary shuffle
  * trees are safe. Every reported count underestimates the true
  * frequency by at most N/capacity (N = stream length), which the spec
  * asserts against exact counts.
  *
  * This is the per-executor-mergeable shape a 1000-executor "top tokens
  * over 100 TB" job needs: O(capacity) state per partial, one small
  * object through the exchange, no explode→groupBy over the full token
  * stream. Output is the top-k entries as array<struct<token,
  * est_count>> ordered by (est_count DESC, token ASC).
  */
case class HeavyHittersSketch(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersSketch.MisraGries] {

  import HeavyHittersSketch._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects a string column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): MisraGries = new MisraGries(capacity)

  override def update(buf: MisraGries, input: InternalRow): MisraGries = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MisraGries, other: MisraGries): MisraGries = {
    buf.absorb(other); buf
  }

  override def eval(buf: MisraGries): Any =
    new GenericArrayData(buf.topK(k).map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })

  override def serialize(buf: MisraGries): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MisraGries =
    MisraGries.fromBytes(bytes, capacity)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object HeavyHittersSketch {

  final class MisraGries(capacity: Int) {
    private val counts = new java.util.HashMap[String, Long](capacity * 2)

    def add(item: String, by: Long): Unit = {
      // NB: counts.get on a java map of primitive Long unboxes a
      // missing key's null to 0L — a null check here is always-true
      // and silently disables eviction (the sketch then degrades to
      // exact counting with unbounded state). Live counters are
      // always ≥ 1 (inserts are ≥1, decrementAll removes ≤0), so 0
      // is a safe miss sentinel.
      val cur = counts.getOrDefault(item, 0L)
      if (cur != 0L) counts.put(item, cur + by)
      else if (counts.size < capacity) counts.put(item, by)
      else decrementAll(by)
    }

    /** Miss on a full table: all counters give up `by` (amortized O(1)
      * per stream element — each decrement cancels a prior increment). */
    private def decrementAll(by: Long): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
      }
    }

    def absorb(other: MisraGries): Unit = {
      other.counts.forEach { (item, c) =>
        counts.put(item, counts.getOrDefault(item, 0L) + c)
      }
      if (counts.size > capacity) {
        // subtract the (capacity+1)-th largest count, drop what's left ≤0
        val vals = new Array[Long](counts.size)
        var i = 0
        counts.forEach { (_, c) => vals(i) = c; i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - capacity - 1)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
        }
      }
    }

    def topK(k: Int): Array[(String, Long)] = {
      val all = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach { (t, c) => all(i) = (t, c); i += 1 }
      all.sortBy { case (t, c) => (-c, t) }.take(k)
    }

    def toBytes: Array[Byte] = {
      var sz = 4
      counts.forEach { (t, _) =>
        sz += 4 + t.getBytes(StandardCharsets.UTF_8).length + 8
      }
      val bb = ByteBuffer.allocate(sz)
      bb.putInt(counts.size)
      counts.forEach { (t, c) =>
        val b = t.getBytes(StandardCharsets.UTF_8)
        bb.putInt(b.length); bb.put(b); bb.putLong(c)
      }
      bb.array()
    }
  }

  object MisraGries {
    def fromBytes(bytes: Array[Byte], capacity: Int): MisraGries = {
      val bb = ByteBuffer.wrap(bytes)
      val m = new MisraGries(capacity)
      val n = bb.getInt
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        m.add(new String(b, StandardCharsets.UTF_8), bb.getLong)
        i += 1
      }
      m
    }
  }
}
