package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: squared L2 distance between two vectors,
  * each `array<float>` or `array<double>`, with whole-stage codegen — a
  * tight primitive loop, no boxing, no per-row lambda arrays (the
  * `aggregate(zip_with(...))` composition it replaces allocates an
  * intermediate array per row).
  *
  * The (b)-tier DOUBLE prefilter of the two-stage argmin family (PQ
  * encode, IVF-PQ coarse assignment, trained-codebook re-encode): it
  * scores ALL candidates cheaply and the decimal fold rescores only the
  * bounded-heap survivors, so this expression never decides an
  * oracle-compared value — its doubles only feed `topk_by_score`.
  */
case class L2SqF32(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqF32 =
    copy(left = newLeft, right = newRight)

  private def toDoubles(a: Any, dt: DataType): Array[Double] = dt match {
    case ArrayType(FloatType, _) =>
      val f = a.asInstanceOf[ArrayData].toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    case _ => a.asInstanceOf[ArrayData].toDoubleArray()
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = toDoubles(a, left.dataType)
    val y = toDoubles(b, right.dataType)
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { val d = x(i) - y(i); acc += d * d; i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Fresh local names: two instances of this expression may land in the
      // same generated function (one projection, two distances).
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      val qn = ctx.freshName("qn")
      val qacc = ctx.freshName("qacc")
      val qi = ctx.freshName("qi")
      val qd = ctx.freshName("qd")
      def arr(v: String, dt: DataType, name: String): (String, String) = dt match {
        case ArrayType(FloatType, _) =>
          (s"float[] $name = $v.toFloatArray();", s"(double) $name[$qi]")
        case _ =>
          (s"double[] $name = $v.toDoubleArray();", s"$name[$qi]")
      }
      val (declX, readX) = arr(a, left.dataType, qx)
      val (declY, readY) = arr(b, right.dataType, qy)
      s"""
         |$declX
         |$declY
         |int $qn = Math.min($qx.length, $qy.length);
         |double $qacc = 0.0;
         |for (int $qi = 0; $qi < $qn; $qi++) {
         |  double $qd = $readX - $readY;
         |  $qacc += $qd * $qd;
         |}
         |${ev.value} = $qacc;
       """.stripMargin
    })

  override def prettyName: String = "l2sq_f32"
}
