package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** KLL-style mergeable quantile sketch (Karnin/Lang/Liberty, FOCS
  * 2016), simplified: a stack of levels, each holding at most
  * `levelCap` doubles; an item at level i represents 2^i original
  * items. A full level is sorted and compacted — every second element
  * survives, promoted one level up — with a DETERMINISTIC alternating
  * start offset instead of KLL's coin flip, trading the randomized
  * guarantee for run-to-run reproducibility (rank error stays
  * O(n / (levelCap · 2^levels)) in practice; the spec bounds it against
  * exact quantiles). Merge concatenates level-wise and re-compacts —
  * closed under merging, so map-side partial aggregation works and the
  * shuffle carries one O(levelCap · log n) object per group, never the
  * values. Eval returns the estimated quantiles for the requested
  * probabilities as array<double>.
  */
case class KllQuantileSketch(
    child: Expression,
    levelCap: Int,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllQuantileSketch.Sketch] {

  import KllQuantileSketch._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_quantiles expects a double column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kll_quantiles"

  override def createAggregationBuffer(): Sketch = new Sketch(levelCap)

  override def update(buf: Sketch, input: InternalRow): Sketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: Sketch, other: Sketch): Sketch = {
    buf.absorb(other); buf
  }

  override def eval(buf: Sketch): Any =
    new GenericArrayData(quantiles.map(buf.quantile).toArray)

  override def serialize(buf: Sketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Sketch =
    Sketch.fromBytes(bytes, levelCap)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KllQuantileSketch {

  final class Sketch(levelCap: Int) {
    // levels(i) holds unsorted doubles, each standing for 2^i inputs
    private val levels = ArrayBuffer(new ArrayBuffer[Double](levelCap))
    private var flip = false // deterministic alternating compaction offset
    private var count = 0L   // total inputs represented

    def add(v: Double): Unit = {
      levels(0) += v
      count += 1
      compactCascade()
    }

    private def compactCascade(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (levels(i).length >= levelCap) {
          val sorted = levels(i).sorted
          val off = if (flip) 1 else 0
          flip = !flip
          if (i + 1 == levels.length) levels += new ArrayBuffer[Double](levelCap)
          var j = off
          while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
          // the un-promoted half is discarded; survivors carry its weight
          levels(i).clear()
        }
        i += 1
      }
    }

    def absorb(other: Sketch): Unit = {
      var i = 0
      while (i < other.levels.length) {
        if (i == levels.length) levels += new ArrayBuffer[Double](levelCap)
        levels(i) ++= other.levels(i)
        i += 1
      }
      count += other.count
      compactCascade()
    }

    /** Weighted-rank quantile: items at level i carry weight 2^i. */
    def quantile(q: Double): Double = {
      val all = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => all += ((v, w)))
        i += 1
      }
      if (all.isEmpty) return Double.NaN
      val sorted = all.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var k = 0
      while (k < sorted.length) {
        cum += sorted(k)._2
        if (cum >= target) return sorted(k)._1
        k += 1
      }
      sorted.last._1
    }

    def toBytes: Array[Byte] = {
      var sz = 4 + 8 + 1
      levels.foreach(l => sz += 4 + 8 * l.length)
      val bb = ByteBuffer.allocate(sz)
      bb.putInt(levels.length)
      bb.putLong(count)
      bb.put(if (flip) 1.toByte else 0.toByte)
      levels.foreach { l =>
        bb.putInt(l.length)
        l.foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  object Sketch {
    def fromBytes(bytes: Array[Byte], levelCap: Int): Sketch = {
      val bb = ByteBuffer.wrap(bytes)
      val s = new Sketch(levelCap)
      val nLevels = bb.getInt
      s.count = bb.getLong
      s.flip = bb.get() == 1
      var i = 0
      while (i < nLevels) {
        if (i == s.levels.length) s.levels += new ArrayBuffer[Double](levelCap)
        val n = bb.getInt
        var j = 0
        while (j < n) { s.levels(i) += bb.getDouble; j += 1 }
        i += 1
      }
      s
    }
  }
}
