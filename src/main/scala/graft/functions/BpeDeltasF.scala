package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-step pair-count DELTAS of applying a BPE merge list to a token
  * array — the incremental-trainer companion of [[BpeMergesF]]. Runs the
  * IDENTICAL greedy left-to-right pass per merge (same buffer loop, same
  * merged-unit-eligible-as-left semantics) but instead of the rewritten
  * tokens it emits, for every merge EVENT, the event-local pair deltas on
  * the evolving sequence ...X p q Y... → ...X u Y...:
  *   −(X,p) −(p,q) −(q,Y) +(X,u) +(u,Y)
  * (missing-neighbor terms skipped at the array ends). Event deltas
  * telescope to the exact multiset difference pairs(after)−pairs(before)
  * per step (OpsSpec pins this against the explicit zip-pair diff), and
  * the emitted volume is proportional to the MERGE WORK (≤5 structs per
  * merge performed), not to document length — the property that keeps the
  * incremental trainer's count-maintenance shuffle tiny while a
  * full-multiset diff would re-emit every pair of every affected
  * document. `step` is the 1-based index into the merge list.
  */
case class BpeDeltasF(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BpeDeltasF.OutType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), ArrayType(StringType, _))
          if second.foldable && third.foldable =>
        val l = second.eval().asInstanceOf[ArrayData]
        val r = third.eval().asInstanceOf[ArrayData]
        if (l == null || r == null || l.numElements() != r.numElements())
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "bpe_deltas expects equal-length non-null left/right merge arrays")
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_deltas expects (array<string>, foldable array<string>, foldable " +
            s"array<string>), got (${first.dataType.simpleString}, " +
            s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
    }

  @transient private lazy val applier: BpeDeltasF.DeltaApplier = {
    val l = second.eval().asInstanceOf[ArrayData]
    val r = third.eval().asInstanceOf[ArrayData]
    val n = l.numElements()
    val lefts = new Array[UTF8String](n)
    val rights = new Array[UTF8String](n)
    val merged = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      lefts(i) = l.getUTF8String(i).clone()
      rights(i) = r.getUTF8String(i).clone()
      merged(i) = UTF8String.concat(lefts(i),
        UTF8String.fromString(graft.ops.TextOps.MergeSep), rights(i))
      i += 1
    }
    new BpeDeltasF.DeltaApplier(lefts, rights, merged)
  }

  override def nullSafeEval(toks: Any, l: Any, r: Any): Any =
    applier.apply(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDeltaApplier", applier,
      classOf[BpeDeltasF.DeltaApplier].getName)
    nullSafeCodeGen(ctx, ev, (toks, _, _) =>
      s"${ev.value} = $ref.apply($toks);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeDeltasF {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = true),
    StructField("b", StringType, nullable = true),
    StructField("dn", LongType, nullable = false),
    StructField("step", IntegerType, nullable = false))), containsNull = false)

  /** Same greedy pass as [[BpeMergesF.Applier]], emitting event deltas. */
  final class DeltaApplier(lefts: Array[UTF8String], rights: Array[UTF8String],
                           merged: Array[UTF8String]) extends Serializable {
    def apply(in: ArrayData): ArrayData = {
      val n = in.numElements()
      val buf = new Array[UTF8String](n)
      var len = n
      var i = 0
      while (i < n) { buf(i) = in.getUTF8String(i); i += 1 }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      def emit(a: UTF8String, b: UTF8String, dn: Long, step: Int): Unit =
        out += new GenericInternalRow(
          Array[Any](if (a == null) null else a.clone(),
            if (b == null) null else b.clone(), dn, step))
      var m = 0
      while (m < lefts.length) {
        val a = lefts(m); val b = rights(m); val ab = merged(m)
        val step = m + 1
        var w = 0
        var rd = 0
        while (rd < len) {
          val cur = buf(rd)
          if (w > 0 && cur != null && b == cur && a == buf(w - 1)) {
            // event on the evolving sequence ...X p q Y... -> ...X u Y...
            val p = buf(w - 1)
            if (w >= 2) { emit(buf(w - 2), p, -1L, step); emit(buf(w - 2), ab, 1L, step) }
            emit(p, cur, -1L, step)
            if (rd + 1 < len) { emit(cur, buf(rd + 1), -1L, step); emit(ab, buf(rd + 1), 1L, step) }
            buf(w - 1) = ab
          } else { buf(w) = cur; w += 1 }
          rd += 1
        }
        len = w
        m += 1
      }
      new GenericArrayData(out.toArray[Any])
    }
  }

  private val FnName = "graft_bpe_deltas"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => BpeDeltasF(exprs(0), exprs(1), exprs(2)), "built-in")

  /** Column builder: per-step event deltas of applying `merges` (training
    * order) to a token array.
    */
  def deltas(spark: SparkSession, tokens: Column,
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
