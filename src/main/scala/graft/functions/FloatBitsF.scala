package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** The raw IEEE-754 bit image of an `array<float>` column as BINARY —
  * 4 bytes per element, big-endian `Float.floatToRawIntBits` — so a
  * content DIGEST of an embedding can key on the stable binary
  * representation instead of Spark's float-to-string rendering (r15
  * ADVICE: the rendering changed across Spark majors, and a persisted
  * digest index keyed on it would silently orphan every historical
  * digest on an engine upgrade, re-admitting exact duplicates).
  *
  * Fixed 4-byte elements make the concatenation prefix-unambiguous:
  * arrays of different lengths can never digest equal. A null ELEMENT
  * (malformed input — the flows' validity gates never pass one) writes
  * the all-ones pattern 0xFFFFFFFF, indistinguishable from that one NaN
  * bit image; distinct NaN payloads digest distinctly (raw bits, not
  * canonicalized).
  */
case class FloatBitsF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_bits expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val bits =
        if (a.isNullAt(i)) 0xFFFFFFFF
        else java.lang.Float.floatToRawIntBits(a.getFloat(i))
      out(i * 4) = (bits >>> 24).toByte
      out(i * 4 + 1) = (bits >>> 16).toByte
      out(i * 4 + 2) = (bits >>> 8).toByte
      out(i * 4 + 3) = bits.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n * 4];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $bits = $a.isNullAt($i) ? 0xFFFFFFFF
         |    : Float.floatToRawIntBits($a.getFloat($i));
         |  $out[$i * 4] = (byte) ($bits >>> 24);
         |  $out[$i * 4 + 1] = (byte) ($bits >>> 16);
         |  $out[$i * 4 + 2] = (byte) ($bits >>> 8);
         |  $out[$i * 4 + 3] = (byte) $bits;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FloatBitsF {
  private val FnName = "graft_float_bits"

  /** Register `graft_float_bits` (idempotent) and return the bit image
    * of `colName` — registry + `expr`, the project's public-API route
    * to a custom Expression (Spark 4's Column no longer wraps one).
    */
  def floatBits(spark: SparkSession, colName: String): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => FloatBitsF(exprs(0)), "built-in")
    expr(s"$FnName($colName)")
  }
}
