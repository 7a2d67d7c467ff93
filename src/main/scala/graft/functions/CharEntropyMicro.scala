package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-stage-codegen'd Shannon character entropy of a string, in
  * integer micro-nats.
  *
  * Quality-filter signal for corpus curation (low-entropy text =
  * repeated characters / padding / binary junk; the entropy family of
  * heuristics appears in CCNet-style cleaning pipelines alongside the
  * length/punctuation ratios of `quality_score`). Zero-shuffle by
  * construction: entropy is a per-document scalar, so the whole
  * computation stays inside the scan's codegen stage — no char-level
  * explode (which would shuffle one row PER CHARACTER: at 100 TB that
  * is the difference between a map-only pass and a 100-TB shuffle).
  *
  * Cross-engine determinism (same idiom as tf_idf's idf_micro): each
  * per-character term `round(k·ln k · 1e6)` is quantized to a LONG
  * before summation, so the sum is order-independent integer math;
  * the final division is integral (positive operands — truncation and
  * floor agree). Entropy in micro-nats:
  *
  *   H_micro = round(ln(n)·1e6) − (Σ_c round(k_c·ln(k_c)·1e6)) div n
  *
  * which is the exact-integer-count factoring of
  * H = ln n − (Σ k ln k)/n. Characters are Unicode CODE POINTS
  * (matches DuckDB's character semantics for `substr`/`length`).
  * Empty/null-safe: n == 0 → 0.
  */
case class CharEntropyMicro(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_micro needs string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    CharEntropyMicro.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyMicro.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyMicro = copy(child = newChild)
}

object CharEntropyMicro {

  /** Static so generated code calls straight into compiled bytecode
    * (one small int-keyed open map per row; no boxing in the count
    * loop beyond the map's int boxing, one String materialization per
    * document). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var n = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    if (n == 0L) return 0L
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val k = it.next()(0).toLong
      sum += Math.round(k * Math.log(k.toDouble) * 1e6)
    }
    Math.round(Math.log(n.toDouble) * 1e6) - sum / n
  }

  /** Column form: Shannon char entropy in integer micro-nats. */
  def entropy(text: Column): Column =
    GraftSqlBridge.column(CharEntropyMicro(GraftSqlBridge.expression(text)))
}
