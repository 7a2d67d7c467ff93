package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd sum of signed 16-bit little-endian samples in
  * a binary payload, starting at a byte offset and reading at most
  * `limit` bytes — the PCM data-chunk reduction of the WAV decode
  * path, bounded by the data_size the header declares (round-6
  * advice: the unbounded form silently summed trailing junk after
  * the declared data chunk, diverging from the documented contract
  * on exactly the corrupted fixtures parseWav is factored to accept).
  *
  * Why a custom Catalyst Expression (guide preference (b)): the
  * composable form — `aggregate(sequence(...), 0L, (acc, k) ->
  * conv(substr(hex(payload), ...)) ...)` — evaluates a higher-order
  * function, which runs INTERPRETED per element (lambda dispatch, two
  * string slices and a base conversion per sample, all allocating).
  * The multimodal_meta row spent 8.9 s in exactly that loop at sf0.1
  * before being spread across partitions; this expression compiles the
  * reduction to a primitive `for` over the raw byte[]: sign
  * reconstruction is two bitwise ops ((lo & 0xFF) | (hi << 8) — the
  * signed high byte shifts the value negative for free), fused into
  * whole-stage codegen with zero allocation.
  *
  * Offset is 0-based; the window end is min(payload length,
  * offset + limit) — an odd trailing byte is ignored (a truncated
  * final sample cannot be decoded); offset beyond the payload or a
  * non-positive limit sums to 0 — all conventions pinned in
  * MultimodalSpec/PropertySpec.
  */
case class PcmS16LeSum(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pcm_s16le_sum needs (binary, int, int), got $a / $b / $c")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(payload: Any, off: Any, lim: Any): Any = {
    val buf = payload.asInstanceOf[Array[Byte]]
    val start = math.max(off.asInstanceOf[Int], 0)
    val end = math.min(buf.length.toLong,
      start.toLong + math.max(lim.asInstanceOf[Int], 0).toLong)
    var acc = 0L
    var i = start
    while (i + 1 < end) {
      acc += ((buf(i) & 0xFF) | (buf(i + 1) << 8)).toLong
      i += 2
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (buf, off, lim) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val start = ctx.freshName("start")
      val end = ctx.freshName("end")
      s"""
         |long $acc = 0L;
         |int $start = $off < 0 ? 0 : $off;
         |long $end = Math.min((long) $buf.length,
         |  (long) $start + (long) ($lim < 0 ? 0 : $lim));
         |for (int $i = $start; $i + 1 < $end; $i += 2) {
         |  $acc += (long) (($buf[$i] & 0xFF) | ($buf[$i + 1] << 8));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PcmS16LeSum =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PcmS16LeSum {
  /** Column form: sum of int16-LE samples in
    * payload[offset, offset + limitBytes). */
  def sum(payload: Column, offset: Column, limitBytes: Column): Column =
    GraftSqlBridge.column(PcmS16LeSum(
      GraftSqlBridge.expression(payload),
      GraftSqlBridge.expression(offset),
      GraftSqlBridge.expression(limitBytes)))

  /** Unbounded form (window runs to end-of-payload) — kept for specs
    * that pin the raw reduction; the WAV decode path passes the
    * header-declared data_size. */
  def sum(payload: Column, offset: Column): Column =
    sum(payload, offset, GraftSqlBridge.column(Literal(Int.MaxValue)))

  /** 2-arg eval-side constructor parity for existing property specs. */
  def apply(payload: Expression, offset: Expression): PcmS16LeSum =
    PcmS16LeSum(payload, offset, Literal(Int.MaxValue))
}
