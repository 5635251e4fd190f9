package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * A Scala UDF would box every float and fall out of whole-stage
  * codegen; these generate a tight primitive loop instead, so the
  * brute-force scan stays in one codegen stage — on a 1000-executor
  * scan of 100 TB of vectors that is the difference between
  * memory-bandwidth-bound and GC-bound.
  *
  * Accumulation is double, in fixed left-to-right element order, so
  * results are bit-deterministic for identical inputs.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<float> arguments")
    }
  }
}

/** dot(a, b); null if lengths differ. */
case class DotFloat(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) in one pass; null if lengths differ or a norm is 0. */
case class CosineFloat(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double) $x.getFloat($i);
         |    double $yv = (double) $y.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  @volatile private var registered = Set.empty[Int]

  /** Register graft_dot / graft_cosine in the session's function
    * registry (idempotent per session) so plans can use
    * expr("graft_cosine(a, b)") — avoids any private Column ctor API. */
  def register(spark: SparkSession): Unit = {
    val key = System.identityHashCode(spark)
    if (!registered.contains(key)) synchronized {
      if (!registered.contains(key)) {
        val reg = spark.sessionState.functionRegistry
        reg.createOrReplaceTempFunction("graft_dot", exprs => DotFloat(exprs(0), exprs(1)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_cosine", exprs => CosineFloat(exprs(0), exprs(1)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_topk",
          exprs => TopKScoreId(exprs(0), exprs(1), exprs(2)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_simhash64",
          exprs => SimHash64(exprs(0)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_nfc",
          exprs => NormalizeNfc(exprs(0)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_winnow",
          exprs => WinnowMinima(exprs(0),
            exprs(1).eval().asInstanceOf[Number].intValue(),
            exprs(2).eval().asInstanceOf[Number].intValue()), "scala_udf")
        reg.createOrReplaceTempFunction("graft_heavyhitters",
          exprs => MisraGries(exprs(0), exprs(1)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_bitmap",
          exprs => BitmapBuild(exprs(0)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_bitmap_or",
          exprs => BitmapOr(exprs(0)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_bitmap_card",
          exprs => BitmapCardinality(exprs(0)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_bloom",
          exprs => BloomBuild(exprs(0), exprs(1), exprs(2)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_might_contain",
          exprs => BloomMightContain(exprs(0), exprs(1)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_kll",
          exprs => KllBuild(exprs(0)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_kll_merge",
          exprs => KllMerge(exprs(0)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_kll_quantile",
          exprs => KllQuantile(exprs(0), exprs(1)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_theta",
          exprs => ThetaBuild(exprs(0)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_theta_union",
          exprs => ThetaUnionAgg(exprs(0)).toAggregateExpression(), "scala_udf")
        reg.createOrReplaceTempFunction("graft_theta_estimate",
          exprs => ThetaEstimate(exprs(0)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_theta_intersect",
          exprs => ThetaIntersect(exprs(0), exprs(1)), "scala_udf")
        reg.createOrReplaceTempFunction("graft_theta_anotb",
          exprs => ThetaANotB(exprs(0), exprs(1)), "scala_udf")
        registered += key
      }
    }
  }
}
