package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{
  Add, And, Attribute, AttributeReference, CreateArray, EqualTo, Explode,
  Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Optimizer rule: rewrite a small-constant-band range join
  *
  *   ... JOIN ... ON <equi keys> AND y BETWEEN x - c1 AND x + c2
  *
  * (x, y integer columns from opposite sides, c1 + c2 + 1 ≤
  * [[MaxBands]]) into the banded equi-join: the x side is exploded
  * into its c1+c2+1 candidate band values and the range pair becomes
  * `band = y` — a plain equi-key, so join blocks are keyed by
  * (equi keys, value) instead of equi keys alone. Semantics are
  * preserved exactly: consecutive band values are distinct, so each
  * qualifying pair matches exactly once, and a NULL x yields NULL
  * bands that (like the original NULL comparison) match nothing. Band
  * arithmetic uses the same eval-mode Add the original bound
  * expressions use.
  *
  * This is the rewrite [[graft.queries.Relational.qJoinRangeBanded]]
  * performs by hand, promoted to the optimizer so the DECLARATIVE
  * spelling gets the scale plan transparently — the measured win is
  * 2.3× at sf0.1 (SCALE.md) and grows with the size of the equi
  * groups. Soundness is gated every driver run: q_join_theta_range
  * writes the declarative form, flows through this rule, and must
  * still hash-match DuckDB's replay of the original BETWEEN.
  *
  * Runs in the post-optimization batch (injected via
  * [[GraftExtensions]]), after predicate pushdown has settled the join
  * condition; planning picks the hash/merge strategy for the new
  * equi-key afterwards. The rewrite only fires on INNER joins — outer
  * variants would need null-extension bookkeeping across the explode.
  */
object RewriteBandedRangeJoin extends Rule[LogicalPlan] {

  /** Explosion factor bound: 3–9 bands trades a small replication for
    * per-(key, value) join blocks; wide bands would multiply the build
    * side past the win.
    */
  val MaxBands = 9

  private def isBandType(t: DataType): Boolean =
    t == IntegerType || t == LongType

  /** Decompose `e` as (attribute, constant offset): x, x + c, x - c. */
  private def asOffset(e: Expression): Option[(Attribute, Long)] = e match {
    case a: Attribute => Some((a, 0L))
    case Add(a: Attribute, Literal(c: Int, IntegerType), _) => Some((a, c.toLong))
    case Add(a: Attribute, Literal(c: Long, LongType), _) => Some((a, c))
    case Subtract(a: Attribute, Literal(c: Int, IntegerType), _) => Some((a, -c.toLong))
    case Subtract(a: Attribute, Literal(c: Long, LongType), _) => Some((a, -c))
    case _ => None
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** The matched band pair: y ≥ x + lo and y ≤ x + hi. */
  private case class Band(x: Attribute, y: Attribute, lo: Long, hi: Long)

  private def findBand(conjuncts: Seq[Expression]): Option[(Band, Seq[Expression])] = {
    val lowers = conjuncts.collect {
      case p @ GreaterThanOrEqual(y: Attribute, bound) if isBandType(y.dataType) =>
        asOffset(bound).map { case (x, c) => (p: Expression, y, x, c) }
    }.flatten
    val uppers = conjuncts.collect {
      case p @ LessThanOrEqual(y: Attribute, bound) if isBandType(y.dataType) =>
        asOffset(bound).map { case (x, c) => (p: Expression, y, x, c) }
    }.flatten
    (for {
      (lp, ly, lx, lo) <- lowers
      (up, uy, ux, hi) <- uppers
      if ly.semanticEquals(uy) && lx.semanticEquals(ux) &&
        lx.dataType == ly.dataType && hi >= lo && hi - lo + 1 <= MaxBands
    } yield (Band(lx, ly, lo, hi),
             conjuncts.filterNot(c => c.eq(lp) || c.eq(up)))).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConj(cond)
      findBand(conjuncts) match {
        // x anchors the band; explode whichever side carries x while y
        // stays a plain attribute on the other
        case Some((b, rest))
            if left.outputSet.contains(b.x) && right.outputSet.contains(b.y) =>
          rebuild(j, b, rest, explodeLeft = true, hint)
        case Some((b, rest))
            if right.outputSet.contains(b.x) && left.outputSet.contains(b.y) =>
          rebuild(j, b, rest, explodeLeft = false, hint)
        case _ => j
      }
  }

  private def lit(v: Long, t: DataType): Literal = t match {
    case IntegerType => Literal(v.toInt, IntegerType)
    case _           => Literal(v, LongType)
  }

  private def rebuild(j: Join, b: Band, rest: Seq[Expression],
                      explodeLeft: Boolean,
                      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : LogicalPlan = {
    val bandAttr = AttributeReference("graft_band", b.x.dataType)()
    val bands = CreateArray(
      (b.lo to b.hi).map(k => Add(b.x, lit(k, b.x.dataType))))
    val exploded = Generate(Explode(bands), unrequiredChildIndex = Nil,
                            outer = false, qualifier = None,
                            generatorOutput = Seq(bandAttr),
                            child = if (explodeLeft) j.left else j.right)
    val newCond = (rest :+ EqualTo(bandAttr, b.y)).reduce(And)
    val newJoin =
      if (explodeLeft) Join(exploded, j.right, Inner, Some(newCond), hint)
      else Join(j.left, exploded, Inner, Some(newCond), hint)
    // restore the original output (drop the band column)
    Project(j.output, newJoin)
  }
}
