package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `array<int>` of ±1 per character of an ASCII string: element i is
  * `(ascii(char_i) % 2) * 2 - 1` — exactly the per-hex-char parity term the
  * SimHash aggregation sums per bit position. One generated loop replaces
  * 32 `substring`+`ascii` string expressions per token (the SimHash hot
  * path over a 100 TB document corpus); the SQL oracle keeps the
  * substring/ascii formulation and matches bit-for-bit.
  *
  * ASCII-only by contract (md5 hex digests); bytes are code points there.
  */
case class AsciiParityVecF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"parity_vec expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = (bytes(i) % 2) * 2 - 1; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int[] $arr = new int[$bytes.length];
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $arr[$i] = ($bytes[$i] % 2) * 2 - 1;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiParityVecF {
  private val FnName = "graft_parity_vec"

  /** Register `graft_parity_vec` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => AsciiParityVecF(exprs.head), "built-in")

  def parityVec(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(FnName, c)
  }
}
