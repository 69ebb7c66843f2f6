package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `n`-token shingles of an `array<string>` token column: element i is
  * the space-joined run tokens[i..i+n-1]; inputs shorter than n yield an
  * empty array. Replaces the interpreted
  * `transform(sequence(...), i -> concat_ws(' ', slice(tokens, i, n)))`
  * lambda on the MinHash/Jaccard hot path with one generated loop —
  * shingling is the dominant per-token cost of document near-dedup at
  * corpus scale. Output is bit-identical to the lambda form (spec'd).
  */
case class WordShinglesF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        // n is foldable, so its value is known at analysis time; n <= 0
        // would otherwise reach eval (n = 0 emits len+1 empty shingles,
        // n < 0 throws NegativeArraySizeException inside executor tasks)
        right.eval() match {
          case n: Int if n >= 1 =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
          case other =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"shingles expects n >= 1, got $other")
        }
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects (array<string>, foldable int), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(toks: Any, nAny: Any): Any = {
    val in = toks.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val count = in.numElements() - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val sep = UTF8String.fromString(" ")
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = in.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, n) => {
      val count = ctx.freshName("count")
      val arr = ctx.freshName("arr")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $count = $toks.numElements() - $n + 1;
         |if ($count <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  Object[] $arr = new Object[$count];
         |  for (int $i = 0; $i < $count; $i++) {
         |    $u8[] $parts = new $u8[$n];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $toks.getUTF8String($i + $j);
         |    }
         |    $arr[$i] = $u8.concatWs($u8.fromString(" "), $parts);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object WordShinglesF {
  private val FnName = "graft_shingles"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => WordShinglesF(exprs(0), exprs(1)), "built-in")

  def shingles(spark: SparkSession, tokens: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, tokens,
      org.apache.spark.sql.functions.lit(n))
  }
}
