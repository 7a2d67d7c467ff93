package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd |A ∩ B| for two SORTED array<long> columns.
  *
  * Why a custom Catalyst Expression (same rationale as
  * [[ArrayDotProduct]]): the near-dup verify paths compute set
  * intersections for every candidate pair, and built-in
  * `array_intersect` builds a hash set per evaluation — allocation +
  * boxing per pair, measured as the dominant cost of the corpus-wide
  * `dedup_minhash` verify (~600k dense-corpus candidates × ~150-element
  * shingle sets). Sorting each doc's set ONCE in the per-doc projection
  * turns every pair check into a primitive two-pointer merge: no
  * allocation, no hashing, fused into the surrounding generated code.
  *
  * Inputs MUST be sorted ascending with distinct elements (the
  * `sort_array(array_distinct(...))` shape the callers build); output
  * is the intersection size as int.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two array<long>, got $l / $r")
    }

  override def dataType: DataType = IntegerType

  // null ELEMENTS null the whole count (reading the slot raw would
  // merge-walk over 0/garbage) — see ArrayDotProduct
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |boolean $hasNull = false;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { $hasNull = true; break; }
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |if ($hasNull) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column form: |a ∩ b| over sorted distinct long arrays. */
  def count(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
