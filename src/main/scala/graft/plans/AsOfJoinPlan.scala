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
  * for every left row, attach the right row of the same key selected by
  * `direction` — `backward` (default): the LAST right row with time <=
  * left time (the reference's load-curve value-at-t lookup held as a step
  * function, `MLSLD00.dat`); `forward`: the FIRST right row with time >=
  * left time (next-calibration / next-maintenance lookups); `nearest`:
  * whichever of the two is closer in time, ties resolving backward (the
  * pandas `merge_asof` direction surface). `toleranceMs` bounds the
  * allowed |right time - left time| in the time unit of the join columns
  * (a match farther away yields the null row instead) — without it a
  * stale curve point silently serves forever.
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
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward",
    tolerance: Long = Long.MaxValue) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward",
    tolerance: Long = Long.MaxValue) extends BinaryExecNode {
  require(Seq("backward", "forward", "nearest").contains(direction),
    s"unknown as-of direction: $direction")

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

    val dir = direction
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      var held: InternalRow = null
      var heldKey = 0L
      var heldTime = 0L

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow).asInstanceOf[Long]
        val lt = lTimeB.eval(lRow).asInstanceOf[Long]
        // consume right rows that are (key, time) <= (lk, lt) — dead for
        // every LATER left row too (left times only grow per key), so
        // consuming is safe for all directions; the last same-key one
        // stays held as the backward candidate. The head of the buffer
        // after this loop is, for key lk, exactly the first same-key row
        // with time > lt: the forward candidate (an exact-time match
        // rt == lt lands in `held`, and serves forward too).
        var advance = true
        while (advance && rBuf.hasNext) {
          val peek = rBuf.head
          val pk = rKeyB.eval(peek).asInstanceOf[Long]
          if (pk < lk || (pk == lk && rTimeB.eval(peek).asInstanceOf[Long] <= lt)) {
            if (pk == lk) {
              held = peek.copy(); heldKey = pk
              heldTime = rTimeB.eval(peek).asInstanceOf[Long]
            }
            rBuf.next()
          } else advance = false
        }
        val back: InternalRow =
          if (held != null && heldKey == lk && lt - heldTime <= tol) held
          else null
        def fwdTime: Long = rTimeB.eval(rBuf.head).asInstanceOf[Long]
        val fwd: InternalRow =
          if (held != null && heldKey == lk && heldTime == lt) held // exact
          else if (rBuf.hasNext &&
              rKeyB.eval(rBuf.head).asInstanceOf[Long] == lk &&
              fwdTime - lt <= tol) rBuf.head
          else null
        val r = dir match {
          case "backward" => if (back != null) back else nullRight
          case "forward" => if (fwd != null) fwd else nullRight
          case _ => // nearest: closer side wins, ties resolve backward
            if (back == null && fwd == null) nullRight
            else if (fwd == null) back
            else if (back == null) fwd
            // exact match: fwd IS back (held) — answer without touching
            // rBuf.head, which may be exhausted or hold the next key
            else if (fwd eq back) back
            else if (lt - heldTime <= fwdTime - lt) back
            else fwd
        }
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
    case AsOfJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
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
           leftTime: String, rightTime: String,
           direction: String = "backward",
           tolerance: Long = Long.MaxValue): DataFrame = {
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
      exprs(0), exprs(1), exprs(2), exprs(3), direction, tolerance))
  }
}
