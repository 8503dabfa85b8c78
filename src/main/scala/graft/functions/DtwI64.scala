package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dynamic-time-warping distance between two
  * `array<bigint>` sequences with |·| step cost — the (b)-tier home for
  * q364's DP (preference order: a custom codegen'd Expression beats the
  * `mapPartitions` it replaces; the loop inlines into whole-stage codegen
  * with no Row boxing and no closure serialization).
  *
  * Exactness: pure integer min/+ arithmetic — the SAME recurrence the
  * DuckDB oracle executes as its anti-diagonal list recursion, so the
  * oracle gate cross-checks two independent implementations.
  *
  * Cost is O(|a|·|b|) per row with an O(min) rolling row — callers bound
  * the series (q364 pins both to 28 days). Inputs with nulls or empty
  * arrays yield null (no silent zero).
  */
case class DtwI64(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwI64 =
    copy(left = newLeft, right = newRight)

  /** Shared big sentinel: far above any reachable path cost, far below
    * Long.MaxValue so sentinel + cost cannot overflow. */
  val Big: Long = 1000000000000000L

  /** Element-level null probe: `toLongArray()` throws on arrays that
    * contain null elements, so both eval paths must check first — the
    * doc contract is "inputs with nulls yield null", and the globally
    * registered SQL function must not crash on `array(1, NULL)`. */
  private def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val ya = b.asInstanceOf[ArrayData]
    if (hasNullElement(xa) || hasNullElement(ya)) return null
    val x = xa.toLongArray()
    val y = ya.toLongArray()
    if (x.isEmpty || y.isEmpty) null
    else {
      val m = y.length
      var prev = new Array[Long](m + 1)
      var cur = new Array[Long](m + 1)
      java.util.Arrays.fill(prev, Big); prev(0) = 0L
      var i = 1
      while (i <= x.length) {
        java.util.Arrays.fill(cur, Big)
        var j = 1
        while (j <= m) {
          val c = math.abs(x(i - 1) - y(j - 1))
          var best = prev(j)
          if (cur(j - 1) < best) best = cur(j - 1)
          if (prev(j - 1) < best) best = prev(j - 1)
          cur(j) = c + best
          j += 1
        }
        val t = prev; prev = cur; cur = t
        i += 1
      }
      java.lang.Long.valueOf(prev(m))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val qx = ctx.freshName("dx")
      val qy = ctx.freshName("dy")
      val qp = ctx.freshName("dprev")
      val qc = ctx.freshName("dcur")
      val qt = ctx.freshName("dtmp")
      val qi = ctx.freshName("di")
      val qj = ctx.freshName("dj")
      val qb = ctx.freshName("dbest")
      val qd = ctx.freshName("dcost")
      val qn = ctx.freshName("dhasnull")
      val qk = ctx.freshName("dk")
      s"""
         |boolean $qn = false;
         |for (int $qk = 0; $qk < $a.numElements(); $qk++) {
         |  if ($a.isNullAt($qk)) { $qn = true; break; }
         |}
         |if (!$qn) {
         |  for (int $qk = 0; $qk < $b.numElements(); $qk++) {
         |    if ($b.isNullAt($qk)) { $qn = true; break; }
         |  }
         |}
         |if ($qn) {
         |  ${ev.isNull} = true;
         |} else {
         |long[] $qx = $a.toLongArray();
         |long[] $qy = $b.toLongArray();
         |if ($qx.length == 0 || $qy.length == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $qp = new long[$qy.length + 1];
         |  long[] $qc = new long[$qy.length + 1];
         |  java.util.Arrays.fill($qp, ${Big}L);
         |  $qp[0] = 0L;
         |  for (int $qi = 1; $qi <= $qx.length; $qi++) {
         |    java.util.Arrays.fill($qc, ${Big}L);
         |    for (int $qj = 1; $qj <= $qy.length; $qj++) {
         |      long $qd = Math.abs($qx[$qi - 1] - $qy[$qj - 1]);
         |      long $qb = $qp[$qj];
         |      if ($qc[$qj - 1] < $qb) $qb = $qc[$qj - 1];
         |      if ($qp[$qj - 1] < $qb) $qb = $qp[$qj - 1];
         |      $qc[$qj] = $qd + $qb;
         |    }
         |    long[] $qt = $qp; $qp = $qc; $qc = $qt;
         |  }
         |  ${ev.value} = $qp[$qy.length];
         |}
         |}
       """.stripMargin
    })

  override def prettyName: String = "dtw_i64"
}
