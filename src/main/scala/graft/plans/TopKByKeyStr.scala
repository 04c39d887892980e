package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** String-keyed sibling of [[TopKByKey]]: keeps the k best
  * (value, id) pairs under (value DESC, id ASC — binary UTF8 order,
  * which matches DuckDB's default binary collation) where the id is a
  * STRING. Same motivation: a `row_number` window partitioned by a
  * low-cardinality key sorts an entire group in one task, while this
  * aggregate carries at most k pairs per (group, partition) through
  * the exchange and merges associatively. Deterministic total order →
  * identical results under any partitioning or merge order → fully
  * DuckDB-oracle-able.
  *
  * Output: array<struct<id string, value double>>, best first.
  */
case class TopKByKeyStr(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByKeyStr.TopSet] {

  import TopKByKeyStr._

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_by_skey expects k >= 1, got $k")
    else if (valueExpr.dataType == DoubleType && idExpr.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_by_skey expects (double, string), got " +
        s"(${valueExpr.dataType}, ${idExpr.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def prettyName: String = "graft_topk_by_skey"

  override def createAggregationBuffer(): TopSet = new TopSet(k)

  override def update(buf: TopSet, input: InternalRow): TopSet = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.offer(v.asInstanceOf[Double], id.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: TopSet, other: TopSet): TopSet = { buf.absorb(other); buf }

  override def eval(buf: TopSet): Any =
    new GenericArrayData(buf.toRows.asInstanceOf[Array[Any]])

  override def serialize(buf: TopSet): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopSet = TopSet.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): TopKByKeyStr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByKeyStr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), idExpr = c(1))
}

object TopKByKeyStr {

  /** ≤k (value, id) pairs kept sorted best-first by (value DESC,
    * id ASC binary); parallel arrays, insertion-shift (k is small).
    * Ids are cloned on entry: Spark reuses the UTF8String backing
    * buffer across rows, so a retained reference would be
    * overwritten by the next input row. */
  final class TopSet(k: Int) {
    private[TopKByKeyStr] var vals = new Array[Double](k)
    private[TopKByKeyStr] var ids = new Array[UTF8String](k)
    private[TopKByKeyStr] var n = 0

    private def better(v1: Double, id1: UTF8String, v2: Double, id2: UTF8String): Boolean =
      v1 > v2 || (v1 == v2 && id1.binaryCompare(id2) < 0)

    def offer(v: Double, id0: UTF8String): Unit = {
      if (n == k && !better(v, id0, vals(n - 1), ids(n - 1))) return
      val id = id0.clone()
      var idx = 0
      while (idx < n && !better(v, id, vals(idx), ids(idx))) idx += 1
      val last = math.min(n, k - 1) // drop current worst if full
      System.arraycopy(vals, idx, vals, idx + 1, last - idx)
      System.arraycopy(ids.asInstanceOf[Array[AnyRef]], idx,
        ids.asInstanceOf[Array[AnyRef]], idx + 1, last - idx)
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
      var size = 4
      var i = 0
      while (i < n) { size += 8 + 4 + ids(i).numBytes(); i += 1 }
      val bb = ByteBuffer.allocate(size)
      bb.putInt(n)
      i = 0
      while (i < n) {
        bb.putDouble(vals(i))
        val b = ids(i).getBytes
        bb.putInt(b.length)
        bb.put(b)
        i += 1
      }
      bb.array()
    }
  }

  object TopSet {
    def fromBytes(bytes: Array[Byte], k: Int): TopSet = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val s = new TopSet(k)
      var i = 0
      while (i < n) {
        s.vals(i) = bb.getDouble
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        s.ids(i) = UTF8String.fromBytes(b)
        i += 1
      }
      s.n = n
      s
    }
  }
}
