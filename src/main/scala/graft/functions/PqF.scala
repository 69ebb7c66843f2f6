package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels ([[graft.ops.Pq]]): the vector is split
  * into `m = dim/dsub` subvectors and each is replaced by the index of its
  * nearest codebook entry (L2) — `m` bytes per vector, a 4·dim/m× raw
  * reduction (32× for the 64-dim fixture at m=8). Codegen'd like
  * [[DotProductF]]/[[Sq8EncodeF]]: tight generated loops over literal
  * codebook arrays riding the expression tree, zero shuffle.
  */

/** `pq_encode(vec, codebook_flat, dsub) → binary(m)`: per-subspace L2
  * argmin over the flattened `[m][K][dsub]` codebook (K entries per
  * subspace; ties keep the first entry, so padded duplicate entries are
  * never chosen and encoding is deterministic).
  */
case class PqEncodeF(vec: Expression, codebook: Expression, dsub: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = codebook
  override def third: Expression = dsub

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebook.dataType, dsub.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<float>, array<float>, int), got " +
          s"(${vec.dataType.simpleString}, ${codebook.dataType.simpleString}, " +
          s"${dsub.dataType.simpleString})")
    }

  override def nullSafeEval(v: Any, cbAny: Any, dsAny: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val ds = dsAny.asInstanceOf[Int]
    val d = x.numElements()
    val m = d / ds
    val k = cb.numElements() / d
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) {
      val base = i * k * ds
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = base + c * ds
        var dist = 0.0
        var j = 0
        while (j < ds) {
          val diff = x.getFloat(i * ds + j) - cb.getFloat(off + j)
          dist += diff.toDouble * diff
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(i) = (best - 128).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, ds) => {
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      s"""
         |int $d = $v.numElements();
         |int $m = $d / $ds;
         |int $k = $cb.numElements() / $d;
         |byte[] $out = new byte[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  int $base = $i * $k * $ds;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $off = $base + $c * $ds;
         |    double $dist = 0.0;
         |    for (int $j = 0; $j < $ds; $j++) {
         |      double $diff = (double) $v.getFloat($i * $ds + $j) - (double) $cb.getFloat($off + $j);
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $out[$i] = (byte) ($best - 128);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(vec = f, codebook = s, dsub = t)
}

/** `pq_codes(vec, codebook_flat, dsub) → array<int>`: [[PqEncodeF]] with
  * integer output — the training-loop form (codes feed a groupBy, and an
  * int array column explodes/element_at's cleanly where a binary does
  * not). Same argmin, same tie rule; spec pins byte/int agreement.
  */
case class PqCodesF(vec: Expression, codebook: Expression, dsub: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = codebook
  override def third: Expression = dsub

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    PqEncodeF(vec, codebook, dsub).checkInputDataTypes()

  override def nullSafeEval(v: Any, cbAny: Any, dsAny: Any): Any = {
    val bytes = PqEncodeF(vec, codebook, dsub)
      .nullSafeEval(v, cbAny, dsAny).asInstanceOf[Array[Byte]]
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) + 128; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, ds) => {
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      s"""
         |int $d = $v.numElements();
         |int $m = $d / $ds;
         |int $k = $cb.numElements() / $d;
         |int[] $out = new int[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  int $base = $i * $k * $ds;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $off = $base + $c * $ds;
         |    double $dist = 0.0;
         |    for (int $j = 0; $j < $ds; $j++) {
         |      double $diff = (double) $v.getFloat($i * $ds + $j) - (double) $cb.getFloat($off + $j);
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $out[$i] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(vec = f, codebook = s, dsub = t)
}

/** `pq_adc(codes, lut_flat) → double`: asymmetric distance computation —
  * the probe-specific lookup table holds `lut[i][c] = dot(probe_sub_i,
  * codebook[i][c])`, so the score is `m` array reads per corpus row and
  * equals `dot(probe, reconstruct(codes))` exactly (up to float-sum
  * regrouping — spec-bounded). The corpus side never decodes.
  */
case class PqAdcF(codes: Expression, lut: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (binary, array<double>), got " +
          s"(${codes.dataType.simpleString}, ${lut.dataType.simpleString})")
    }

  override def nullSafeEval(cAny: Any, lAny: Any): Any = {
    val codes = cAny.asInstanceOf[Array[Byte]]
    val lut = lAny.asInstanceOf[ArrayData]
    val m = codes.length
    val k = lut.numElements() / m
    var acc = 0.0
    var i = 0
    while (i < m) {
      acc += lut.getDouble(i * k + (codes(i) + 128))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $m = $c.length;
         |int $k = $l.numElements() / $m;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $acc += $l.getDouble($i * $k + ($c[$i] + 128));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(codes = newLeft, lut = newRight)
}

/** `pq_decode(codes, codebook_flat) → array<float>`: reconstruct the
  * vector by concatenating each subspace's codebook entry — the generic
  * decode that lets a PQ-coded table feed any downstream float-vector
  * kernel (IVF search over a PQ index loads through this; the ADC path
  * [[PqAdcF]] is the faster serving form when only dot scores are needed).
  */
case class PqDecodeF(codes: Expression, codebook: Expression, dsub: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = codebook
  override def third: Expression = dsub

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, codebook.dataType, dsub.dataType) match {
      case (BinaryType, ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_decode expects (binary, array<float>, int), got " +
          s"(${codes.dataType.simpleString}, ${codebook.dataType.simpleString}, " +
          s"${dsub.dataType.simpleString})")
    }

  override def nullSafeEval(cAny: Any, cbAny: Any, dsAny: Any): Any = {
    val codes = cAny.asInstanceOf[Array[Byte]]
    val cb = cbAny.asInstanceOf[ArrayData]
    val ds = dsAny.asInstanceOf[Int]
    val m = codes.length
    val k = cb.numElements() / (m * ds)
    val out = new Array[Float](m * ds)
    var i = 0
    while (i < m) {
      val off = (i * k + (codes(i) + 128)) * ds
      var j = 0
      while (j < ds) { out(i * ds + j) = cb.getFloat(off + j); j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, cb, ds) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      s"""
         |int $m = $c.length;
         |int $k = $cb.numElements() / ($m * $ds);
         |float[] $out = new float[$m * $ds];
         |for (int $i = 0; $i < $m; $i++) {
         |  int $off = ($i * $k + ($c[$i] + 128)) * $ds;
         |  for (int $j = 0; $j < $ds; $j++) {
         |    $out[$i * $ds + $j] = $cb.getFloat($off + $j);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(codes = f, codebook = s, dsub = t)
}

object PqF {
  /** Register `graft_pq_encode` / `graft_pq_adc` (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_encode", es => PqEncodeF(es(0), es(1), es(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_codes", es => PqCodesF(es(0), es(1), es(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_adc", es => PqAdcF(es(0), es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_decode", es => PqDecodeF(es(0), es(1), es(2)), "built-in")
  }
}
