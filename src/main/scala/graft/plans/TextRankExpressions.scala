package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Four synchronous damped-TextRank rounds over ONE document's word
  * adjacency list, returning the top-3 words, as
  * `array<struct<pos:int, word:string, rank_fp:bigint>>`.
  *
  * Input: `array<struct<src:string, dst:string, cnt:bigint>>` — the
  * document's MIRRORED bigram-adjacency counts (each undirected
  * co-occurrence contributes both directions), any order.
  *
  * Semantics are EXACTLY the distributed recurrence it replaces
  * (text_textrank, mirrored verbatim in the DuckDB oracle):
  *   deg(w)   = Σ_{(w,d,c)} c
  *   r0(w)    = 2²⁰
  *   r_{i+1}(w) = (15·2²⁰ + 85·Σ_{(s,w,c)} c·(r_i(s) div deg(s))) div 100
  * four rounds, then the top 3 words by (r4 DESC, word ASC) with their
  * 1-based position. All arithmetic is non-negative-long division and
  * long addition — order-invariant, so the undefined collect order of
  * the input array cannot change the result, and the expression is
  * deterministic.
  *
  * Why native (r17, guide §1.2/§8): each per-doc graph is bounded by
  * the document's token count, and 500k of them iterate SIMULTANEOUSLY.
  * As a distributed recurrence every round costs two corpus-scale
  * joins + an aggregation — r16 measured ~20 sequential AQE stage
  * rounds of pure wall (2.9-3.1 s at sf0.1) with the data itself tiny;
  * co-partitioning by doc_id removed the exchanges but left 4 unrolled
  * SMJ+agg plan levels whose per-task setup dominated (task 4.5→10 s).
  * This loop does the whole recurrence in O(4·E_doc) long ops over two
  * int-indexed arrays: ONE doc_id exchange in the whole query, rank
  * math at memory speed. The shuffle-once-compute-local shape is the
  * 100 TB-correct one: rank state never crosses the network.
  */
case class TextRankTop3(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val FP = 1048576L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.length == 3 && st(0).dataType == StringType &&
          st(1).dataType == StringType && st(2).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_textrank_top3 expects array<struct<string,string,bigint>>, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("word", StringType, nullable = false),
    StructField("rank_fp", LongType, nullable = false))))

  override def prettyName: String = "graft_textrank_top3"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // intern words to dense indices (mirrored edges: every word occurs
    // as src, so interning srcs+dsts yields exactly the node set)
    val idx = new java.util.HashMap[UTF8String, Integer](n * 2)
    val words = new java.util.ArrayList[UTF8String]()
    val srcs = new Array[Int](n)
    val dsts = new Array[Int](n)
    val cnts = new Array[Long](n)
    def intern(u: UTF8String): Int = {
      val got = idx.get(u)
      if (got != null) got.intValue()
      else {
        val u2 = u.clone() // detach from the (reused) input buffer
        val i = words.size()
        idx.put(u2, Integer.valueOf(i)); words.add(u2); i
      }
    }
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      srcs(i) = intern(row.getUTF8String(0))
      dsts(i) = intern(row.getUTF8String(1))
      cnts(i) = row.getLong(2)
      i += 1
    }
    val nw = words.size()
    val deg = new Array[Long](nw)
    i = 0
    while (i < n) { deg(srcs(i)) += cnts(i); i += 1 }
    var r = new Array[Long](nw)
    java.util.Arrays.fill(r, FP)
    var snew = new Array[Long](nw)
    var round = 0
    while (round < 4) {
      java.util.Arrays.fill(snew, 0L)
      var j = 0
      while (j < n) { // all quantities non-negative: / ≡ div
        snew(dsts(j)) += cnts(j) * (r(srcs(j)) / deg(srcs(j)))
        j += 1
      }
      var w = 0
      while (w < nw) { snew(w) = (15L * FP + 85L * snew(w)) / 100L; w += 1 }
      val t = r; r = snew; snew = t // swap; old r is next round's scratch
      round += 1
    }
    // top-3 by (rank DESC, word ASC) — a strict total order (words are
    // distinct within a doc), same as the oracle's row_number window
    val order = new Array[Integer](nw)
    var w = 0
    while (w < nw) { order(w) = Integer.valueOf(w); w += 1 }
    val rr = r
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(rr(b.intValue()), rr(a.intValue()))
        if (c != 0) c else words.get(a.intValue()).compareTo(words.get(b.intValue()))
      }
    })
    val k = math.min(3, nw)
    val out = new Array[Any](k)
    var p = 0
    while (p < k) {
      val wi = order(p).intValue()
      out(p) = new GenericInternalRow(
        Array[Any](p + 1, words.get(wi), rr(wi)))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
