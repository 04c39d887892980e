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
    // levels(i) is a primitive scratch array filled to lens(i); each
    // stored double stands for 2^i inputs. Primitive arrays keep the
    // per-row add path allocation-free — the original
    // ArrayBuffer[Double] boxed every value, and that box/unbox churn
    // WAS the sketch's measured cost (sketch_quantiles 1.2 s at sf0.1;
    // see SURVEY §6). Compaction order, the deterministic alternating
    // offset, and the survivor rule are unchanged, so results are
    // bit-identical to the boxed implementation.
    private val levels = ArrayBuffer(new Array[Double](levelCap))
    private val lens = ArrayBuffer(0)
    private var flip = false // deterministic alternating compaction offset
    private var count = 0L   // total inputs represented

    private def ensure(i: Int, extra: Int): Unit = {
      while (i >= levels.length) {
        levels += new Array[Double](levelCap)
        lens += 0
      }
      if (lens(i) + extra > levels(i).length)
        levels(i) = java.util.Arrays.copyOf(levels(i),
          math.max(levels(i).length * 2, lens(i) + extra))
    }

    def add(v: Double): Unit = {
      levels(0)(lens(0)) = v
      lens(0) += 1
      count += 1
      if (lens(0) >= levelCap) compactCascade()
    }

    private def compactCascade(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (lens(i) >= levelCap) {
          val n = lens(i)
          java.util.Arrays.sort(levels(i), 0, n)
          val off = if (flip) 1 else 0
          flip = !flip
          ensure(i + 1, (n - off + 1) / 2)
          val up = levels(i + 1)
          var j = off
          var k = lens(i + 1)
          while (j < n) { up(k) = levels(i)(j); k += 1; j += 2 }
          lens(i + 1) = k
          // the un-promoted half is discarded; survivors carry its weight
          lens(i) = 0
        }
        i += 1
      }
    }

    def absorb(other: Sketch): Unit = {
      var i = 0
      while (i < other.levels.length) {
        val n = other.lens(i)
        ensure(i, n)
        System.arraycopy(other.levels(i), 0, levels(i), lens(i), n)
        lens(i) += n
        i += 1
      }
      count += other.count
      compactCascade()
    }

    /** Weighted-rank quantile: items at level i carry weight 2^i. */
    def quantile(q: Double): Double = {
      var m = 0
      var i = 0
      while (i < levels.length) { m += lens(i); i += 1 }
      if (m == 0) return Double.NaN
      val vs = new Array[Double](m)
      val ws = new Array[Long](m)
      val idx = new Array[Integer](m)
      var p = 0
      i = 0
      while (i < levels.length) {
        val w = 1L << i
        var j = 0
        while (j < lens(i)) { vs(p) = levels(i)(j); ws(p) = w; p += 1; j += 1 }
        i += 1
      }
      var t = 0
      while (t < m) { idx(t) = t; t += 1 }
      java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
        java.lang.Double.compare(vs(a), vs(b)))
      var total = 0L
      var k = 0
      while (k < m) { total += ws(k); k += 1 }
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      k = 0
      while (k < m) {
        cum += ws(idx(k))
        if (cum >= target) return vs(idx(k))
        k += 1
      }
      vs(idx(m - 1))
    }

    def toBytes: Array[Byte] = {
      var sz = 4 + 8 + 1
      lens.foreach(n => sz += 4 + 8 * n)
      val bb = ByteBuffer.allocate(sz)
      bb.putInt(levels.length)
      bb.putLong(count)
      bb.put(if (flip) 1.toByte else 0.toByte)
      var i = 0
      while (i < levels.length) {
        val n = lens(i)
        bb.putInt(n)
        var j = 0
        while (j < n) { bb.putDouble(levels(i)(j)); j += 1 }
        i += 1
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
        val n = bb.getInt
        s.ensure(i, n)
        var j = 0
        while (j < n) { s.levels(i)(s.lens(i) + j) = bb.getDouble; j += 1 }
        s.lens(i) += n
        i += 1
      }
      s
    }
  }
}
