package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_might_contain(key, bloomBytes)` — membership test of a
  * bigint key against a serialized `org.apache.spark.util.sketch.
  * BloomFilter`, as a codegen'd Catalyst predicate.
  *
  * This is the semi-join-reduction primitive: when the build side of a
  * join is too big to broadcast as a hash relation but its KEY SET
  * compresses into a few MB of bloom bits, filtering the probe side
  * with the bloom BEFORE the shuffle removes most non-matching rows at
  * the scan, so the exchange ships only (candidate) rows. False
  * positives are culled by the exact join that follows, so the
  * composition is semantically transparent — which is also why the
  * operator that uses it carries a plain-join DuckDB oracle.
  *
  * The filter bytes arrive as a foldable binary literal (built once on
  * the driver by `DataFrameStatFunctions.bloomFilter`, itself a
  * distributed aggregation); deserialization happens once per
  * expression instance, and codegen references the deserialized filter
  * object directly — the hot loop is one `mightContainLong` call, no
  * per-row deserialization. On a real cluster the same bytes would ride
  * a broadcast variable; at bloom sizes up to a few MB the task-binary
  * path used here is equivalent.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_bloom_might_contain expects (bigint, foldable binary), got " +
          s"${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(key: Any, bytes: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = $bloomRef.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
