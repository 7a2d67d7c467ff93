package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): split a document into
  * variable-length chunks at boundaries determined by a local rolling
  * hash of the trailing 4-gram — the storage-dedup technique (LBFS /
  * FastCDC family, Muthitacharoen et al. SOSP'01) applied to corpus
  * text: identical content ANYWHERE yields identical chunk sequences,
  * so shared passages align even when surrounding edits shift their
  * byte offsets — the shift-resilience fixed windows (dedup_substring)
  * fundamentally lack.
  *
  * Boundary rule: after code-point position i (1-based, i ≥ 4) iff
  *   (((cp(i−3)·31 + cp(i−2))·31 + cp(i−1))·31 + cp(i)) mod 16 == 0
  * — a pure function of the local 4-gram, NO min/max clamp: real CDC
  * implementations clamp chunk sizes, but the clamp makes boundary
  * decisions depend on the previous cut (sequential state). Dropping
  * it keeps the rule POSITION-INDEPENDENT, which is the scale
  * property: the whole chunking is one embarrassingly-parallel
  * per-row loop, and the same rule is replayable in plain SQL
  * (dup-mass statistics simply restrict to chunks ≥ a length floor,
  * recovering what the min-clamp is for). Mean chunk ≈ 16 code
  * points (geometric, p = 1/16).
  *
  * Code points, not chars or bytes — matches DuckDB's substr/len
  * semantics exactly, so the oracle can rebuild every chunk by
  * substring. Codegen'd as a single static call per row
  * (CharEntropyMicro idiom); the per-row loop is compiled bytecode,
  * never an interpreted higher-order function. */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunks = copy(child = newChild)
}

object CdcChunks {

  /** Boundary selectivity: h % Mask == 0 → mean chunk ≈ Mask cps. */
  val Mask = 16L
  /** Rolling-gram width. */
  val Gram = 4

  /** Static so generated code calls straight into compiled bytecode.
    * One code-point array + one String per chunk per document. */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](n / 8 + 1)
    var start = 0
    var i = Gram - 1
    while (i < n) {
      val h = ((cps(i - 3).toLong * 31 + cps(i - 2)) * 31 +
        cps(i - 1)) * 31 + cps(i)
      if (h % Mask == 0L) {
        out += UTF8String.fromString(
          new String(cps, start, i + 1 - start))
        start = i + 1
      }
      i += 1
    }
    if (start < n)
      out += UTF8String.fromString(new String(cps, start, n - start))
    new GenericArrayData(out.toArray)
  }

  /** Column form: the document's CDC chunk list. */
  def chunks(text: Column): Column =
    GraftSqlBridge.column(CdcChunks(GraftSqlBridge.expression(text)))
}
