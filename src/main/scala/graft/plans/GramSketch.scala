package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Mergeable fixed-point Gram accumulator over an `array<float>`
  * embedding column: each partition accumulates the upper triangle of
  * Σ x·xᵀ as d(d+1)/2 exact longs IN PLACE (p_ij = ⌊x_i·x_j·10⁶+0.5⌋,
  * identical IEEE to the expression form), so the exchange carries ONE
  * ~2080-long buffer per partition instead of the 2080-struct-per-ROW
  * explode it replaces — at 10⁹ vectors that is the difference between
  * a 2·10¹²-row partial-agg input and a per-task array add. Long sums
  * are order-invariant, so results are bit-identical to the explode
  * plan and the DuckDB oracles of embedding_gram / embedding_pca_project
  * are unchanged.
  *
  * Output: array<struct<i int, j int, gram_fp long, n_vecs long>> —
  * `inline(...)` restores the row form downstream code expects.
  */
case class GramSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramSketch.Acc] {

  import GramSketch._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram expects an array<float> column, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("gram_fp", LongType, nullable = false),
    StructField("n_vecs", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_gram"

  override def createAggregationBuffer(): Acc = new Acc

  override def update(buf: Acc, input: InternalRow): Acc = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      // defined null behavior: a vector with ANY null element is
      // skipped whole (contributes neither products nor n_vecs) —
      // previously getFloat silently read nulls as 0.0, diverging from
      // the explode form / oracle, which propagate null products
      var chk = 0
      while (chk < d) {
        if (arr.isNullAt(chk)) return buf
        chk += 1
      }
      buf.init(d)
      var i = 0
      var k = 0
      while (i < d) {
        val xi = arr.getFloat(i).toDouble
        var j = i
        while (j < d) {
          buf.g(k) += math.floor(xi * arr.getFloat(j).toDouble * 1000000.0 + 0.5).toLong
          k += 1
          j += 1
        }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: Acc, other: Acc): Acc = { buf.absorb(other); buf }

  override def eval(buf: Acc): Any = {
    if (buf.d < 0) return new GenericArrayData(Array.empty[Any])
    val d = buf.d
    val out = new Array[Any](buf.g.length)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = InternalRow(i, j, buf.g(k), buf.n)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Acc): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Acc = Acc.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): GramSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object GramSketch {

  /** Upper-triangle long accumulator; d fixed by the first vector. */
  final class Acc {
    var d: Int = -1
    var n: Long = 0L
    var g: Array[Long] = null

    def init(dim: Int): Unit = {
      if (d < 0) { d = dim; g = new Array[Long](dim * (dim + 1) / 2) }
      else require(d == dim,
        s"graft_gram: mixed embedding dimensions ($d vs $dim)")
    }

    def absorb(other: Acc): Unit = {
      if (other.d < 0) return
      if (d < 0) { d = other.d; n = other.n; g = other.g.clone(); return }
      require(d == other.d,
        s"graft_gram: mixed embedding dimensions ($d vs ${other.d})")
      n += other.n
      var k = 0
      while (k < g.length) { g(k) += other.g(k); k += 1 }
    }

    def toBytes: Array[Byte] = {
      val len = if (d < 0) 0 else g.length
      val bb = ByteBuffer.allocate(4 + 8 + 8 * len)
      bb.putInt(d)
      bb.putLong(n)
      var k = 0
      while (k < len) { bb.putLong(g(k)); k += 1 }
      bb.array()
    }
  }

  object Acc {
    def fromBytes(bytes: Array[Byte]): Acc = {
      val bb = ByteBuffer.wrap(bytes)
      val a = new Acc
      a.d = bb.getInt
      a.n = bb.getLong
      if (a.d >= 0) {
        a.g = new Array[Long](a.d * (a.d + 1) / 2)
        var k = 0
        while (k < a.g.length) { a.g(k) = bb.getLong; k += 1 }
      }
      a
    }
  }
}
