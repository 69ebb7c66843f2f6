package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product over two `array<float>` columns, accumulated in
  * double — a custom Catalyst Expression with whole-stage codegen
  * (SURVEY §4 item (2): the one fused kernel the profile asked for).
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` chain used by
  * the similarity operators: semantically identical (same left-to-right
  * accumulation order, so bit-identical doubles and oracle-safe), but it
  * skips materializing the zipped intermediate array per row and runs as
  * a tight generated loop — the hot path of brute-force cosine top-k over
  * a 100 TB embedding corpus.
  *
  * Lengths differing (not expected for fixed-dim embeddings) fold over the
  * common prefix; a null in either input yields null.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_f expects (array<float>, array<float>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotProductF {
  private val FnName = "graft_dot_f"
  @volatile private var registered = false

  /** Register `graft_dot_f` in the session's function registry (idempotent)
    * and return a Column-level handle. Registry + `expr` keeps us on the
    * public API (Spark 4's Column no longer wraps Expression directly).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    registered = true
  }

  /** dot_f over two array<float> columns resolvable by name. */
  def dotF(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"$FnName($a, $b)")
  }
}
