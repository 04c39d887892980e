package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`topN` IVF cells for one vector against the broadcast centroid
  * table, as `array<struct<neg: double, cell: int>>` sorted ascending
  * by (neg, cell) — i.e. (cosine DESC, cell ASC).
  *
  * Semantics are EXACTLY the declarative chain it replaces in
  * `Similarity.scoreCells`:
  * {{{
  *   slice(sort_array(transform(cents, c =>
  *     struct((-round(dot(emb, c.cvec) / sqrt(na * c.nb), 6)).as("neg"),
  *            c.cell))), 1, topN)
  * }}}
  * reproduced operation for operation so the DuckDB-oracled build is
  * bit-unchanged: the dot accumulates (double)float·double left to
  * right from 0.0 (= zip_with+aggregate = HyperplaneDot); rounding is
  * Spark `Round(_, 6)`'s own double path (NaN/Inf pass through, else
  * `BigDecimal.valueOf(x).setScale(6, HALF_UP)`); the double ordering
  * is Spark's nan-safe array-sort ordering (NaN largest, -0.0 == 0.0).
  *
  * Why native: the lambda-interpreter chain allocates and re-sorts a
  * cells-long struct array per row, which at N·cells scale IS the IVF
  * build cost (measured ~10 µs/cell·row at 160 cells). This loop keeps
  * a bounded topN scratch (callers use 1 or 2) and no per-cell
  * allocation, so the full-corpus assign pass — the one pass sampled
  * training cannot remove — stays linear with a small constant.
  */
case class TopCellsByCos(emb: Expression, na: Expression, cents: Expression,
    topN: Int) extends TernaryExpression with CodegenFallback {

  override def first: Expression = emb
  override def second: Expression = na
  override def third: Expression = cents
  override def prettyName: String = "graft_top_cells"

  private val cellStruct = StructType(Seq(
    StructField("cell", IntegerType), StructField("cvec", ArrayType(DoubleType)),
    StructField("nb", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = emb.dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    }
    val centsOk = cents.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == IntegerType &&
          (fs(1).dataType match {
            case ArrayType(DoubleType, _) => true; case _ => false
          }) && fs(2).dataType == DoubleType
      case _ => false
    }
    if (embOk && na.dataType == DoubleType && centsOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top_cells expects (array<float>, double, array<$cellStruct>), " +
        s"got (${emb.dataType}, ${na.dataType}, ${cents.dataType})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neg", DoubleType), StructField("cell", IntegerType))))

  // Spark's nan-safe double ordering (NaN == NaN and NaN largest,
  // -0.0 == 0.0) — what sort_array applies to the struct's first field.
  private def nanSafeLt(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x); val yn = java.lang.Double.isNaN(y)
    if (xn) false else if (yn) true else x < y
  }
  private def nanSafeEq(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x); val yn = java.lang.Double.isNaN(y)
    (xn && yn) || (!xn && !yn && x == y)
  }

  override def nullSafeEval(embAny: Any, naAny: Any, centsAny: Any): Any = {
    val a = embAny.asInstanceOf[ArrayData]
    val naV = naAny.asInstanceOf[Double]
    val cs = centsAny.asInstanceOf[ArrayData]
    val nCells = cs.numElements()
    val k = math.min(topN, nCells)
    // bounded scratch, kept sorted ascending by (neg, cell)
    val negs = new Array[Double](k)
    val cells = new Array[Int](k)
    var filled = 0
    var j = 0
    while (j < nCells) {
      val st = cs.getStruct(j, 3)
      val cell = st.getInt(0)
      val cvec = st.getArray(1)
      val nb = st.getDouble(2)
      val n = math.min(a.numElements(), cvec.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += a.getFloat(i).toDouble * cvec.getDouble(i)
        i += 1
      }
      val cos = dot / math.sqrt(naV * nb)
      // Spark Round(double, 6): NaN/Inf unchanged, else HALF_UP via the
      // decimal string representation (BigDecimal.valueOf)
      val rounded =
        if (java.lang.Double.isNaN(cos) || java.lang.Double.isInfinite(cos)) cos
        else java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val neg = -rounded
      // insert into the sorted scratch if it beats the current worst
      val beats = filled < k || nanSafeLt(neg, negs(filled - 1)) ||
        (nanSafeEq(neg, negs(filled - 1)) && cell < cells(filled - 1))
      if (beats) {
        var p = math.min(filled, k - 1) // insertion slot (worst drops off)
        while (p > 0 && (nanSafeLt(neg, negs(p - 1)) ||
            (nanSafeEq(neg, negs(p - 1)) && cell < cells(p - 1)))) {
          negs(p) = negs(p - 1); cells(p) = cells(p - 1); p -= 1
        }
        negs(p) = neg; cells(p) = cell
        if (filled < k) filled += 1
      }
      j += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      out(r) = InternalRow(negs(r), cells(r))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(emb = newFirst, na = newSecond, cents = newThird)
}
