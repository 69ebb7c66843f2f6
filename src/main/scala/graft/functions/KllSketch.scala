package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Mergeable quantile sketch — the reserved `TypedImperativeAggregate`
  * of SURVEY §2.10, completing the maintained-summary surface: the
  * summary family (ops.Sketches) could answer count/sum/min/max/distinct
  * (HLL) and fixed-bin histograms incrementally, but percentiles only by
  * exact re-sort. This sketch is the incremental percentile answer:
  * bounded size, mergeable, so `maintain` folds a delta's sketch into
  * the stored one without rescanning history.
  *
  * Structure: a KLL-style compactor ladder with DETERMINISTIC
  * alternating compaction (no randomness — determinism is a project-wide
  * contract). Level h holds items of weight 2^h, capacity `k` doubles
  * each; a full level sorts, keeps alternating items (offset flips per
  * compaction so consecutive compaction errors cancel), and promotes
  * them. Worst-case rank error of the alternating ladder is ~2·n/k
  * (one uncancelled ±2^h per level, summed ≈ 2^(H+1) = 2n/k), i.e.
  * ≤ 0.8% of n at the default k=256 — specs and the catalog gate assert
  * a 2% envelope for margin. Total weight is conserved EXACTLY
  * (compaction halves count, doubles weight), pinned in specs.
  *
  * Scale shape: per-group state is O(k·log(n/k)) doubles regardless of
  * n — a 100 TB column sketches into kilobytes per group; merges are
  * buffer concatenations + bounded compactions. NaNs and nulls are
  * skipped (the sum/min/max convention).
  */
object KllState {
  val DefaultK = 256

  def empty(k: Int): KllState = new KllState(k)

  def deserialize(bytes: Array[Byte]): KllState = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    require(in.get() == 1.toByte, "bad KLL sketch version")
    val k = in.getInt()
    val s = new KllState(k)
    s.n = in.getLong()
    val numLevels = in.getInt()
    var h = 0
    while (h < numLevels) {
      val flip = in.get() == 1.toByte
      val sz = in.getInt()
      val buf = new scala.collection.mutable.ArrayBuffer[Double](sz)
      var i = 0
      while (i < sz) { buf += in.getDouble(); i += 1 }
      s.levels += buf
      s.flips += flip
      h += 1
    }
    s
  }

  /** Quantile read straight off serialized bytes (summary-row reads). */
  def quantileFromBytes(bytes: Array[Byte], q: Double): java.lang.Double = {
    val s = deserialize(bytes)
    if (s.n == 0L) null else java.lang.Double.valueOf(s.quantile(q))
  }

  /** Multi-quantile read: ONE deserialize + ONE weighted sort serve every
    * requested quantile (report()'s p50/p90/p99 would otherwise decode
    * and re-sort the sketch once per column). Null on an empty sketch.
    */
  def quantilesFromBytes(bytes: Array[Byte], qs: Array[Double]): Array[Double] = {
    val s = deserialize(bytes)
    if (s.n == 0L) null else s.quantiles(qs)
  }
}

final class KllState(val k: Int) extends Serializable {
  import scala.collection.mutable.ArrayBuffer
  private[functions] var n: Long = 0L
  private[functions] val levels = ArrayBuffer.empty[ArrayBuffer[Double]]
  private[functions] val flips = ArrayBuffer.empty[Boolean]

  private def ensureLevel(h: Int): Unit =
    while (levels.length <= h) { levels += ArrayBuffer.empty[Double]; flips += false }

  def insert(v: Double): Unit = {
    ensureLevel(0)
    levels(0) += v
    n += 1L
    compactFrom(0)
  }

  /** Compact any over-capacity levels bottom-up: sort, keep alternating
    * items (offset = the level's flip bit, which toggles — consecutive
    * compaction errors cancel), promote to h+1 at doubled weight.
    */
  private def compactFrom(start: Int): Unit = {
    var h = start
    while (h < levels.length) {
      if (levels(h).length >= k) {
        val sorted = levels(h).sorted
        val off = if (flips(h)) 1 else 0
        flips(h) = !flips(h)
        ensureLevel(h + 1)
        // alternating selection is weight-exact only over an EVEN count:
        // on an odd count, one extreme (the end not covered by the kept
        // offset) stays behind at this level at its own weight, so total
        // weight is conserved exactly (spec-pinned via totalWeight == n)
        val len = sorted.length
        val odd = len % 2 == 1
        val stop = if (off == 0 && odd) len - 1 else len
        var i = off
        while (i < stop) { levels(h + 1) += sorted(i); i += 2 }
        levels(h).clear()
        if (odd) levels(h) += (if (off == 0) sorted(len - 1) else sorted(0))
        h += 1
      } else h += 1
    }
  }

  def mergeIn(o: KllState): Unit = {
    require(o.k == k, s"cannot merge KLL sketches with different k: $k vs ${o.k}")
    var h = 0
    while (h < o.levels.length) {
      if (o.levels(h).nonEmpty) { ensureLevel(h); levels(h) ++= o.levels(h) }
      h += 1
    }
    n += o.n
    compactFrom(0)
  }

  /** Value at rank ceil(q·n) over the weighted item multiset. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1]: $q")
    require(n > 0L, "empty sketch")
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** Batch [[quantile]]: one item gather + one sort answer all `qs`
    * (walked in target-rank order, results restored to input order).
    */
  def quantiles(qs: Array[Double]): Array[Double] = {
    require(n > 0L, "empty sketch")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"q must be in [0,1]: $q"))
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val order = qs.indices.sortBy(i => qs(i))
    val out = new Array[Double](qs.length)
    var cum = 0L
    var i = 0
    var oi = 0
    while (oi < order.length && i < sorted.length) {
      val target = math.max(1L, math.ceil(qs(order(oi)) * n).toLong)
      while (i < sorted.length && cum + sorted(i)._2 < target) {
        cum += sorted(i)._2; i += 1
      }
      out(order(oi)) = sorted(math.min(i, sorted.length - 1))._1
      oi += 1
    }
    while (oi < order.length) { // any residue lands on the max item
      out(order(oi)) = sorted.last._1; oi += 1
    }
    out
  }

  /** Exact total weight held by the ladder (== n; spec-pinned). */
  def totalWeight: Long = {
    var t = 0L
    var h = 0
    while (h < levels.length) { t += levels(h).length.toLong * (1L << h); h += 1 }
    t
  }

  def serialize(): Array[Byte] = {
    var bytes = 1 + 4 + 8 + 4
    levels.foreach(l => bytes += 1 + 4 + 8 * l.length)
    val out = java.nio.ByteBuffer.allocate(bytes)
    out.put(1.toByte)
    out.putInt(k)
    out.putLong(n)
    out.putInt(levels.length)
    var h = 0
    while (h < levels.length) {
      out.put(if (flips(h)) 1.toByte else 0.toByte)
      out.putInt(levels(h).length)
      levels(h).foreach(out.putDouble)
      h += 1
    }
    out.array()
  }
}

/** Aggregate a DOUBLE column into a serialized KLL sketch (binary) —
  * the `hll_sketch_agg` analogue for quantiles.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType if k >= 8 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll k must be >= 8, got $k")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll expects a double column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KllState = KllState.empty(k)

  override def update(b: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) b.insert(d)
    }
    b
  }

  override def merge(b: KllState, o: KllState): KllState = { b.mergeIn(o); b }
  override def eval(b: KllState): Any = b.serialize()
  override def serialize(b: KllState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KllState = KllState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(nc: Expression): KllSketchAgg =
    copy(child = nc)
}

/** Union serialized KLL sketches (binary column) — the `hll_union_agg`
  * analogue, used by summary MERGE so maintenance never rescans facts.
  */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_merge expects a binary sketch column, got ${other.simpleString}")
    }

  // an empty-input group yields an empty k=DefaultK sketch; an EMPTY
  // buffer holds nothing to fold, so it ADOPTS the first real operand
  // outright — this is what fixes k from the data (mergeIn requires
  // equal k, which would spuriously reject any non-default k here)
  override def createAggregationBuffer(): KllState = KllState.empty(KllState.DefaultK)

  override def update(b: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val o = KllState.deserialize(v.asInstanceOf[Array[Byte]])
      if (b.n == 0L) o else { b.mergeIn(o); b }
    }
  }

  override def merge(b: KllState, o: KllState): KllState =
    if (b.n == 0L) o
    else if (o.n == 0L) b
    else { b.mergeIn(o); b }
  override def eval(b: KllState): Any = b.serialize()
  override def serialize(b: KllState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KllState = KllState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(nc: Expression): KllMergeAgg =
    copy(child = nc)
}

/** Scalar quantile read off a serialized sketch. Runs on summary rows
  * (key-bounded by the summary contract), not fact rows; codegen emits
  * one static call per row so the surrounding stage stays whole-stage.
  */
case class KllQuantileF(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with BinaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_quantile expects (binary, foldable double), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(bytes: Any, q: Any): Any = {
    val r = KllState.quantileFromBytes(bytes.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, q) => {
      val tmp = ctx.freshName("kllq")
      s"""
         |java.lang.Double $tmp = graft.functions.KllState.quantileFromBytes($bytes, $q);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Batch quantile read: (sketch binary, foldable array<double> of qs) →
  * array<double>. One deserialize + one weighted sort per ROW serve all
  * requested quantiles — the report() path selects this once and unpacks
  * with element_at, instead of paying a decode+sort per quantile column.
  */
case class KllQuantilesF(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_quantiles expects (binary, foldable array<double>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  @transient private lazy val qsArr: Array[Double] =
    right.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()

  override def nullSafeEval(bytes: Any, qs: Any): Any = {
    val r = KllState.quantilesFromBytes(bytes.asInstanceOf[Array[Byte]], qsArr)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qsRef = ctx.addReferenceObj("kllQs", qsArr, "double[]")
    nullSafeCodeGen(ctx, ev, (bytes, _) => {
      val tmp = ctx.freshName("kllqs")
      s"""
         |double[] $tmp = graft.functions.KllState.quantilesFromBytes($bytes, $qsRef);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Column builders (function-registry registration, house pattern). */
object KllF {
  private val AggName = "graft_kll_agg"
  private val MergeName = "graft_kll_merge_agg"
  private val QuantileName = "graft_kll_quantile"
  private val QuantilesName = "graft_kll_quantiles"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(AggName, exprs =>
      KllSketchAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction(MergeName, exprs =>
      KllMergeAgg(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(QuantileName, exprs =>
      KllQuantileF(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(QuantilesName, exprs =>
      KllQuantilesF(exprs(0), exprs(1)), "built-in")
  }

  def sketchAgg(spark: SparkSession, value: Column,
                k: Int = KllState.DefaultK): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(AggName, value,
      org.apache.spark.sql.functions.lit(k))
  }

  def mergeAgg(spark: SparkSession, sketch: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(MergeName, sketch)
  }

  def quantile(spark: SparkSession, sketch: Column, q: Double): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(QuantileName, sketch,
      org.apache.spark.sql.functions.lit(q))
  }

  def quantiles(spark: SparkSession, sketch: Column, qs: Seq[Double]): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{array, call_function, lit}
    call_function(QuantilesName, sketch, array(qs.map(lit): _*))
  }
}
