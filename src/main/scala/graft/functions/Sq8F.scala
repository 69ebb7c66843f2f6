package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Affine int8 scalar quantization (SQ8) of an embedding vector — the
  * storage-compression kernel for a 100 TB vector corpus: each float32
  * dimension is mapped to one byte through a per-dimension affine code
  * `round((x - offset_i) / scale_i)` clamped to [0, 255], packed into a
  * `binary` column (1 byte/dim vs 4 — a 4× raw reduction before parquet
  * encoding). Codegen'd like [[DotProductF]]: a tight generated loop, no
  * intermediate arrays, whole-stage-compatible.
  *
  * Encode and decode are exact inverses up to the quantization grid:
  * `|x − decode(encode(x))| ≤ scale_i / 2` per dimension (spec-pinned in
  * QuantizeSpec). A zero scale (constant dimension) encodes to code 0 and
  * decodes to the offset — exact for that dimension.
  */
case class Sq8EncodeF(vec: Expression, offset: Expression, scale: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = offset
  override def third: Expression = scale

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, offset.dataType, scale.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _),
            ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sq8_encode expects 3 × array<float>, got (${vec.dataType.simpleString}, " +
          s"${offset.dataType.simpleString}, ${scale.dataType.simpleString})")
    }

  override def nullSafeEval(v: Any, o: Any, s: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val off = o.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val si = sc.getFloat(i)
      val code =
        if (si == 0f) 0
        else {
          val c = Math.round((x.getFloat(i) - off.getFloat(i)) / si)
          if (c < 0) 0 else if (c > 255) 255 else c
        }
      out(i) = (code - 128).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, o, s) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val si = ctx.freshName("si")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  float $si = $s.getFloat($i);
         |  int $c;
         |  if ($si == 0f) { $c = 0; }
         |  else {
         |    $c = Math.round(($v.getFloat($i) - $o.getFloat($i)) / $si);
         |    if ($c < 0) $c = 0; else if ($c > 255) $c = 255;
         |  }
         |  $out[$i] = (byte) ($c - 128);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(vec = f, offset = s, scale = t)
}

/** Inverse of [[Sq8EncodeF]]: reconstruct the float vector from its byte
  * codes, `x̂_i = (code_i + 128) · scale_i + offset_i`. Emitting
  * `array<float>` keeps the reconstructed column drop-in compatible with
  * every downstream similarity kernel ([[DotProductF]], IVF search).
  */
case class Sq8DecodeF(codes: Expression, offset: Expression, scale: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = offset
  override def third: Expression = scale

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, offset.dataType, scale.dataType) match {
      case (BinaryType, ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sq8_decode expects (binary, array<float>, array<float>), got " +
          s"(${codes.dataType.simpleString}, ${offset.dataType.simpleString}, " +
          s"${scale.dataType.simpleString})")
    }

  override def nullSafeEval(cAny: Any, o: Any, s: Any): Any = {
    val codes = cAny.asInstanceOf[Array[Byte]]
    val off = o.asInstanceOf[ArrayData]
    val sc = s.asInstanceOf[ArrayData]
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) {
      out(i) = (codes(i) + 128) * sc.getFloat(i) + off.getFloat(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, o, s) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.length;
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = ($c[$i] + 128) * $s.getFloat($i) + $o.getFloat($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(codes = f, offset = s, scale = t)
}

object Sq8F {
  /** Register `graft_sq8_encode` / `graft_sq8_decode` (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sq8_encode", es => Sq8EncodeF(es(0), es(1), es(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sq8_decode", es => Sq8DecodeF(es(0), es(1), es(2)), "built-in")
  }
}
