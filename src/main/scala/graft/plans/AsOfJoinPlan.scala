package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator as-of join (SURVEY J6 / the guide's custom-operator tier):
  * for every left row, attach the LAST right row of the same key whose time
  * is <= the left row's time (the reference's load-curve value-at-t lookup
  * held as a step function, `MLSLD00.dat`).
  *
  * Physical strategy: both sides hash-cluster on the key and sort by
  * (key, time) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements inserts exactly the
  * shuffles/sorts needed — then a single streaming merge pass per
  * partition holds ONE candidate right row at a time. O(n+m) per
  * partition, no window buffering, no state beyond one held row: at scale
  * this beats the window formulation (which materializes per-key frames)
  * and is the classic time-series join in columnar engines.
  *
  * Keys and times must be non-null LongType (the builder enforces it) —
  * epoch-nanos/millis and integer ids, which is what the engine's tables
  * carry.
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val leftOut = left.output
    val out = output
    val rightWidth = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      var held: InternalRow = null
      var heldKey = 0L

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow).asInstanceOf[Long]
        val lt = lTimeB.eval(lRow).asInstanceOf[Long]
        // consume right rows that are (key, time) <= (lk, lt); the last
        // same-key one becomes the held candidate
        var advance = true
        while (advance && rBuf.hasNext) {
          val peek = rBuf.head
          val pk = rKeyB.eval(peek).asInstanceOf[Long]
          if (pk < lk || (pk == lk && rTimeB.eval(peek).asInstanceOf[Long] <= lt)) {
            if (pk == lk) { held = peek.copy(); heldKey = pk }
            rBuf.next()
          } else advance = false
        }
        val r = if (held != null && heldKey == lk) held else nullRight
        proj(joined(lRow, r))
      }
    }
  }
}

/** Planner strategy for [[AsOfJoin]]; registered by [[GraftExtensions]]
  * and (idempotently) by [[AsOfJoinOps.asof]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Public builder: `asof(left, right, keys..., times...)` returns a
  * DataFrame backed by the custom logical node. Column names must be
  * unambiguous across the two sides (alias before joining, as with any
  * self-join).
  *
  * CONTRACT: the right side must have at most one row per (key, time) —
  * "the value as of t" is ambiguous when several rows share the same
  * time, and which one a sort-based merge holds is not deterministic.
  * Deduplicate first (e.g. `groupBy(key, time).agg(max(value))`), as
  * `q_asof_curve` does.
  */
object AsOfJoinOps {
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[ClassicSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    val exprs = Seq(attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime))
    exprs.foreach { a =>
      require(a.dataType == LongType,
        s"as-of join requires LongType keys/times; ${a.name} is ${a.dataType.simpleString}")
    }
    Bridge.ofRows(spark, AsOfJoin(lp, rp,
      exprs(0), exprs(1), exprs(2), exprs(3)))
  }
}
