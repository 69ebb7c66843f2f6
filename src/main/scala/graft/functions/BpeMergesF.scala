package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a trained BPE merge list to an `array<string>` token column —
  * the tokenizer SERVING hot path. Semantically identical to chaining
  * `TextOps.mergeFold` once per merge (the training fold; equivalence is
  * spec-pinned), but linear: one in-place pass per merge over a reused
  * buffer instead of a per-element `concat(acc, array(x))` accumulator
  * copy, which made the declarative chain O(tokens²·merges) per document
  * (measured 8.1 s for 8 merges over sf0.1 documents; this expression
  * serves the same query in well under a second). The merge lists are
  * foldable literals (parallel left/right arrays), so the merge table is
  * decoded ONCE per operator, not per row.
  *
  * Greedy left-to-right, merges applied in training order; a merged unit
  * is immediately eligible as the LEFT part of the same merge again
  * (matching the fold's element_at(acc, -1) check exactly).
  */
case class BpeMergesF(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), ArrayType(StringType, _))
          if second.foldable && third.foldable =>
        val l = second.eval().asInstanceOf[ArrayData]
        val r = third.eval().asInstanceOf[ArrayData]
        if (l == null || r == null || l.numElements() != r.numElements())
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "bpe_apply expects equal-length non-null left/right merge arrays")
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply expects (array<string>, foldable array<string>, foldable " +
            s"array<string>), got (${first.dataType.simpleString}, " +
            s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
    }

  /** Decoded merge table + the reusable per-merge pass, built once per
    * operator instance (the children are foldable by contract).
    */
  @transient private lazy val applier: BpeMergesF.Applier = {
    val l = second.eval().asInstanceOf[ArrayData]
    val r = third.eval().asInstanceOf[ArrayData]
    val n = l.numElements()
    val lefts = new Array[UTF8String](n)
    val rights = new Array[UTF8String](n)
    val merged = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // clone out of the foldable ArrayData so the table owns its bytes
      lefts(i) = l.getUTF8String(i).clone()
      rights(i) = r.getUTF8String(i).clone()
      merged(i) = UTF8String.concat(lefts(i),
        UTF8String.fromString(graft.ops.TextOps.MergeSep), rights(i))
      i += 1
    }
    new BpeMergesF.Applier(lefts, rights, merged)
  }

  override def nullSafeEval(toks: Any, l: Any, r: Any): Any =
    applier.apply(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the loop lives in the pre-compiled Applier; codegen emits one call
    // per row through a reference object, keeping the operator inside
    // WholeStageCodegen with no per-row decode of the merge table
    val ref = ctx.addReferenceObj("bpeApplier", applier,
      classOf[BpeMergesF.Applier].getName)
    nullSafeCodeGen(ctx, ev, (toks, _, _) =>
      s"${ev.value} = $ref.apply($toks);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergesF {
  /** One linear greedy pass per merge over a shared growable buffer. */
  final class Applier(lefts: Array[UTF8String], rights: Array[UTF8String],
                      merged: Array[UTF8String]) extends Serializable {
    def apply(in: ArrayData): ArrayData = {
      val n = in.numElements()
      var buf = new Array[UTF8String](n)
      var len = n
      var i = 0
      while (i < n) { buf(i) = in.getUTF8String(i); i += 1 }
      var m = 0
      while (m < lefts.length) {
        val a = lefts(m); val b = rights(m); val ab = merged(m)
        var w = 0 // write cursor; [0, w) is the folded prefix
        var rd = 0
        while (rd < len) {
          val cur = buf(rd)
          if (w > 0 && cur != null && b == cur && a == buf(w - 1))
            buf(w - 1) = ab
          else { buf(w) = cur; w += 1 }
          rd += 1
        }
        len = w
        m += 1
      }
      val out = new Array[Any](len)
      var k = 0
      while (k < len) { out(k) = buf(k); k += 1 }
      new GenericArrayData(out)
    }
  }

  private val FnName = "graft_bpe_apply"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => BpeMergesF(exprs(0), exprs(1), exprs(2)), "built-in")

  /** Column builder: apply `merges` (training order) to a token array. */
  def applyMerges(spark: SparkSession, tokens: Column,
                  merges: Seq[(String, String)]): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{array, call_function, lit}
    val lefts =
      if (merges.isEmpty) array().cast("array<string>")
      else array(merges.map(m => lit(m._1)): _*)
    val rights =
      if (merges.isEmpty) array().cast("array<string>")
      else array(merges.map(m => lit(m._2)): _*)
    call_function(FnName, tokens, lefts, rights)
  }
}
