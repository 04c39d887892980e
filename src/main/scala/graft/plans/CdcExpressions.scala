package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunks of a string under the Gear-style boundary
  * predicate, as `array<string>`.
  *
  * Semantics are EXACTLY the declarative chain it replaces in
  * `Multimodal.mm_cdc_chunks`: codepoint values c[1..L] (what
  * `ascii(substr(i, 1))` / DuckDB `ord` return), a boundary after
  * position i (4 ≤ i ≤ L) whenever
  * `(8·c[i-3] + 4·c[i-2] + 2·c[i-1] + c[i]) % 32 = 0`, cut positions
  * `distinct(0, boundaries…, L)` ascending, chunk j =
  * `substr(cuts[j-1]+1, cuts[j]-cuts[j-1])` (codepoint-addressed, like
  * Spark `substr`).
  *
  * Why native: the declarative chain materializes a length-L codepoint
  * array via `ascii(substr(i, 1))` — an O(L) scan per position, O(L²)
  * per document — then filters positions with four `element_at`s per
  * candidate and re-substrings every chunk. This loop decodes UTF-8
  * once, keeps a 4-codepoint ring, and slices chunks by byte offset:
  * O(L) per document with no per-position allocation. Byte slicing at
  * codepoint cut offsets is exact because each cut's byte offset is
  * tracked during the same decode pass.
  */
case class CdcChunks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks expects string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = b.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0            // byte cursor
    var lastCut = 0      // byte offset of the last cut
    var count = 0        // codepoints consumed
    var c3 = 0L; var c2 = 0L; var c1 = 0L // ring: c[i-3], c[i-2], c[i-1]
    while (i < n) {
      val b0 = b(i) & 0xFF
      var cp = 0L; var len = 1
      if (b0 < 0x80) cp = b0.toLong
      else if ((b0 & 0xE0) == 0xC0 && i + 1 < n) {
        len = 2; cp = (((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F)).toLong
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < n) {
        len = 3
        cp = (((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) |
          (b(i + 2) & 0x3F)).toLong
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < n) {
        len = 4
        cp = (((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)).toLong
      } else cp = b0.toLong // malformed tail: degrade to the raw byte
      i += len
      count += 1
      if (count >= 4 && (8 * c3 + 4 * c2 + 2 * c1 + cp) % 32 == 0) {
        out += UTF8String.fromBytes(b, lastCut, i - lastCut)
        lastCut = i
      }
      c3 = c2; c2 = c1; c1 = cp
    }
    if (lastCut < n) out += UTF8String.fromBytes(b, lastCut, n - lastCut)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
