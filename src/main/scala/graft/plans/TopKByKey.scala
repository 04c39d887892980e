package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k-per-group aggregate: keeps the k best (value, id)
  * pairs under the total order (value DESC, id ASC) — the window-free
  * formulation of "top k rows per group". A `row_number` window must
  * shuffle every raw row into its group's sort (or be hand-salted into
  * the two-phase plan, q7); this aggregate carries at most k pairs per
  * (group, partition) through the exchange and merges associatively,
  * so the raw stream never moves. Deterministic total order (id breaks
  * ties) → identical results under any partitioning, retry, or merge
  * order — fully DuckDB-oracle-able.
  *
  * Output: array<struct<id bigint, value double>>, best first.
  */
case class TopKByKey(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByKey.TopSet] {

  import TopKByKey._

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_by_key expects k >= 1, got $k")
    else if (valueExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_by_key expects (double, bigint), got " +
        s"(${valueExpr.dataType}, ${idExpr.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def prettyName: String = "graft_topk_by_key"

  override def createAggregationBuffer(): TopSet = new TopSet(k)

  override def update(buf: TopSet, input: InternalRow): TopSet = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.offer(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopSet, other: TopSet): TopSet = { buf.absorb(other); buf }

  override def eval(buf: TopSet): Any =
    new GenericArrayData(buf.toRows.asInstanceOf[Array[Any]])

  override def serialize(buf: TopSet): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopSet = TopSet.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): TopKByKey =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByKey =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), idExpr = c(1))
}

object TopKByKey {

  /** ≤k (value, id) pairs kept sorted best-first by (value DESC,
    * id ASC); parallel arrays, insertion-shift (k is small). */
  final class TopSet(k: Int) {
    private var vals = new Array[Double](k)
    private var ids = new Array[Long](k)
    private var n = 0

    /** True when (v1, id1) outranks (v2, id2). */
    private def better(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
      v1 > v2 || (v1 == v2 && id1 < id2)

    def offer(v: Double, id: Long): Unit = {
      if (n == k && !better(v, id, vals(n - 1), ids(n - 1))) return
      // find insert position (first slot this pair outranks)
      var idx = 0
      while (idx < n && !better(v, id, vals(idx), ids(idx))) idx += 1
      val last = math.min(n, k - 1) // drop current worst if full
      System.arraycopy(vals, idx, vals, idx + 1, last - idx)
      System.arraycopy(ids, idx, ids, idx + 1, last - idx)
      vals(idx) = v
      ids(idx) = id
      if (n < k) n += 1
    }

    def absorb(other: TopSet): Unit = {
      var i = 0
      while (i < other.n) { offer(other.vals(i), other.ids(i)); i += 1 }
    }

    def toRows: Array[InternalRow] =
      Array.tabulate(n)(i => InternalRow(ids(i), vals(i)))

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(vals(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object TopSet {
    def fromBytes(bytes: Array[Byte], k: Int): TopSet = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val s = new TopSet(k)
      var i = 0
      while (i < n) { s.vals(i) = bb.getDouble; s.ids(i) = bb.getLong; i += 1 }
      s.n = n
      s
    }
  }
}
