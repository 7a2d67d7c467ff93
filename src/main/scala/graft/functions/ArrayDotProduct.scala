package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd dot product of two numeric arrays.
  *
  * Why a custom Catalyst Expression (guide preference (b)): the
  * composable form `aggregate(zip_with(a, b, _*_), 0, _+_)` allocates
  * a zipped array and evaluates two lambdas per element outside
  * whole-stage codegen — measured 169 s for the 2M-pair
  * dedup_embedding at sf0.1. This expression compiles to a primitive
  * `for` loop over the two ArrayData buffers: no allocation, no
  * boxing, fused into the surrounding generated code.
  *
  * Supports array<long> (exact fixed-point path — oracle-parity
  * math, see VectorOps) and array<double>. Result type = element
  * type. Arrays of different lengths dot over the common prefix.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot needs two array<long> or two array<double>, got $l / $r")
    }

  override def dataType: DataType = elementType

  // a null ELEMENT nulls the whole dot product (the built-in array
  // functions' convention) — reading the slot raw would silently use
  // 0/garbage; containsNull can't be rejected statically because
  // transform()/parquet arrays carry containsNull=true even when no
  // null ever occurs
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    elementType match {
      case LongType =>
        var acc = 0L
        var i = 0
        while (i < n) {
          if (a.isNullAt(i) || b.isNullAt(i)) return null
          acc += a.getLong(i) * b.getLong(i); i += 1
        }
        acc
      case DoubleType =>
        var acc = 0d
        var i = 0
        while (i < n) {
          if (a.isNullAt(i) || b.isNullAt(i)) return null
          acc += a.getDouble(i) * b.getDouble(i); i += 1
        }
        acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (jt, get) = elementType match {
        case LongType => ("long", "getLong")
        case DoubleType => ("double", "getDouble")
      }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |  ? $a.numElements() : $b.numElements();
         |$jt $acc = 0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |  $acc += $a.$get($i) * $b.$get($i);
         |}
         |if ($hasNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column form: dot(a, b). */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
