package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule (SURVEY §4 item 4): rewrite epsilon-band joins into the
  * cell-binned equi-join the reference engine's `CellSize` grid implements
  * by hand (`UniaxialCompressionTest/MLS00con.dat:2`).
  *
  * Pattern: an INNER join whose condition carries a conjunct
  * `abs(l - r) < eps` (l from the left side, r from the right, eps a
  * positive literal) and NO equality conjunct — i.e., a join Spark can only
  * plan as a nested-loop cross product. Rewrite:
  *
  *  - left gains `__band_pbin = explode(floor(l/eps) + (-1, 0, +1))`
  *  - right gains `__band_bin = floor(r/eps)`
  *  - the join becomes an equi-join on the bin plus the original
  *    condition as residual; a final Project restores the original output.
  *
  * Any pair with |l-r| < eps spans at most adjacent cells, so probing the
  * three neighbor cells of one side finds every pair exactly once (the
  * build side keeps its single home cell). O(n·m) becomes a shuffle
  * equi-join — the difference between a cross product and a join at scale.
  *
  * Registered by [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or via
  * `spark.experimental.extraOptimizations`.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val PbinName = "__band_pbin"
  private val BinName = "__band_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && notYetRewritten(j) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => sidesSplit(a, b, left, right).isDefined
        case _ => false
      }
      if (hasEqui) j
      else findBand(conjuncts, left, right) match {
        case Some((lExpr, rExpr, eps)) => rewrite(j, lExpr, rExpr, eps)
        case None => j
      }
  }

  private def notYetRewritten(j: Join): Boolean =
    !(j.left.output.exists(_.name == PbinName) ||
      j.right.output.exists(_.name == BinName))

  /** Does `a` reference only `left` and `b` only `right` (or swapped)? */
  private def sidesSplit(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] = {
    def refs(e: Expression) = e.references.subsetOf(left.outputSet) -> e.references.subsetOf(right.outputSet)
    (refs(a), refs(b)) match {
      case ((true, _), (_, true)) if a.references.nonEmpty && b.references.nonEmpty => Some((a, b))
      case ((_, true), (true, _)) if a.references.nonEmpty && b.references.nonEmpty => Some((b, a))
      case _ => None
    }
  }

  /** Find `abs(l - r) < eps` (either comparison direction). */
  private def findBand(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double)] =
    conjuncts.collectFirst(Function.unlift {
      case LessThan(Abs(Subtract(a, b, _), _), Literal(eps: Double, DoubleType)) if eps > 0 =>
        sidesSplit(a, b, left, right).map { case (l, r) => (l, r, eps) }
      case GreaterThan(Literal(eps: Double, DoubleType), Abs(Subtract(a, b, _), _)) if eps > 0 =>
        sidesSplit(a, b, left, right).map { case (l, r) => (l, r, eps) }
      case _ => None
    })

  private def bin(e: Expression, eps: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(eps, DoubleType)))

  private def rewrite(j: Join, lExpr: Expression, rExpr: Expression,
      eps: Double): LogicalPlan = {
    val homeBin = Alias(bin(lExpr, eps), "__band_home")()
    val leftWithBin = Project(j.left.output :+ homeBin, j.left)
    val pbinAttr = AttributeReference(PbinName, LongType, nullable = true)()
    val probes = Generate(
      Explode(CreateArray(Seq(
        Subtract(homeBin.toAttribute, Literal(1L)),
        homeBin.toAttribute,
        Add(homeBin.toAttribute, Literal(1L))))),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(pbinAttr),
      child = leftWithBin)
    val rbin = Alias(bin(rExpr, eps), BinName)()
    val rightWithBin = Project(j.right.output :+ rbin, j.right)
    val newCond = And(EqualTo(pbinAttr, rbin.toAttribute), j.condition.get)
    val newJoin = Join(probes, rightWithBin, Inner, Some(newCond), j.hint)
    Project(j.output, newJoin)
  }
}

/** Session extension registering the engine's planner additions AND the
  * custom SQL function surface — `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` gives a stock session the full engine:
  * the band-join rewrite, the as-of join strategy, and the codegen
  * functions (`graft_dot_f`, `graft_parity_vec`, `graft_shingles`)
  * without any imperative registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectOptimizerRule(_ => BandJoinRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((FunctionIdentifier("graft_dot_f"),
      new ExpressionInfo(classOf[graft.functions.DotProductF].getName, "graft_dot_f"),
      (exprs: Seq[Expression]) => graft.functions.DotProductF(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_parity_vec"),
      new ExpressionInfo(classOf[graft.functions.AsciiParityVecF].getName, "graft_parity_vec"),
      (exprs: Seq[Expression]) => graft.functions.AsciiParityVecF(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.functions.WordShinglesF].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => graft.functions.WordShinglesF(exprs(0), exprs(1))))
  }
}
