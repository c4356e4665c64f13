package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

import graft.functions.{CosineSimilarity, FirstEqualBand, SrpBands}

/** OPT-IN Catalyst rewrite of cosine-threshold joins into an SRP-LSH
  * banded equi-join — the SURVEY §4 stretch goal, delivered as a
  * `Rule[LogicalPlan]` (registered by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`, or at runtime through
  * `spark.experimental.extraOptimizations`).
  *
  * Shape: `a JOIN b ON cosine_similarity(va, vb) >= τ [AND rest]` with
  * NO equi-conjunct is a Cartesian product — |a|·|b| cosine kernels, the
  * plan that stops existing at corpus scale. Under
  * `spark.graft.srpJoinRewrite.enabled=true` it becomes
  *
  * {{{
  * Project(original output)
  *   Filter(original condition AND first_equal_band(ba, bb) = band)
  *     Join on (band, key)                    — hash join, shuffles by key
  *       Generate(posexplode(srp_bands(va)))  — map-only signing
  *       Generate(posexplode(srp_bands(vb)))
  * }}}
  *
  * The hyperplanes are an IMPLICIT splitmix64 family
  * ([[graft.functions.SrpKernel.h]]) — no plane table, no dimension
  * knowledge at plan time; the `first_equal_band` predicate keeps a
  * pair only at its first agreeing band, so multi-band collisions never
  * duplicate an output row and input multiplicity is preserved exactly
  * (each qualifying (rowA, rowB) pair emits at most once).
  *
  * APPROXIMATE, hence opt-in and default-off: output is the subset of
  * the true join whose pairs collide on ≥1 band — recall
  * `1 − (1 − (1 − θ/π)^bandBits)^bands` (θ = arccos τ). The defaults
  * (96 bits as 16 bands × 6) hold recall ≥ 0.95 for τ ≥ 0.7; the rule
  * refuses thresholds below `minThreshold` (default 0.65), where the
  * formula collapses and silence would be data loss. Joins that already
  * carry an equi-conjunct are left alone — they hash-join fine without
  * help, and that guard also makes the rule a fixed-point (its own
  * output is an equi-join).
  *
  * Configs (all session-settable):
  *   - `spark.graft.srpJoinRewrite.enabled`      (false)
  *   - `spark.graft.srpJoinRewrite.nBits`        (96)
  *   - `spark.graft.srpJoinRewrite.bandBits`     (6)
  *   - `spark.graft.srpJoinRewrite.seed`         (42)
  *   - `spark.graft.srpJoinRewrite.minThreshold` (0.65)
  */
class SrpJoinRewrite extends Rule[LogicalPlan] {

  private def boolConf(k: String, d: String): Boolean =
    conf.getConfString(k, d).toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!boolConf("spark.graft.srpJoinRewrite.enabled", "false")) return plan
    val nBits = conf.getConfString(
      "spark.graft.srpJoinRewrite.nBits", "96").toInt
    val bandBits = conf.getConfString(
      "spark.graft.srpJoinRewrite.bandBits", "6").toInt
    val seed = conf.getConfString(
      "spark.graft.srpJoinRewrite.seed", "42").toLong
    val minTau = conf.getConfString(
      "spark.graft.srpJoinRewrite.minThreshold", "0.65").toDouble
    plan.transformUp {
      case j @ Join(left, right, Inner | Cross, Some(cond), _)
          if eligible(j, left, right, cond, minTau) =>
        rewrite(j, left, right, cond, nBits, bandBits, seed, minTau)
          .getOrElse(j)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The cosine-threshold conjunct, as (vecLeftSide, vecRightSide, the
    * conjunct's threshold) oriented to (left, right). */
  private def cosineConjunct(left: LogicalPlan, right: LogicalPlan,
                             c: Expression,
                             minTau: Double): Option[(Expression, Expression)] = {
    def orient(cs: CosineSimilarity): Option[(Expression, Expression)] = {
      val (a, b) = (cs.left, cs.right)
      if (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet)) Some((b, a))
      else None
    }
    def vecTyped(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val hit = c match {
      case GreaterThanOrEqual(cs: CosineSimilarity, Literal(t: Double, DoubleType))
          if t >= minTau => orient(cs)
      case GreaterThan(cs: CosineSimilarity, Literal(t: Double, DoubleType))
          if t >= minTau => orient(cs)
      case LessThanOrEqual(Literal(t: Double, DoubleType), cs: CosineSimilarity)
          if t >= minTau => orient(cs)
      case LessThan(Literal(t: Double, DoubleType), cs: CosineSimilarity)
          if t >= minTau => orient(cs)
      case _ => None
    }
    hit.filter { case (a, b) => vecTyped(a) && vecTyped(b) }
  }

  /** Rewrite only the Cartesian shape: a conjunct already equi-joining
    * the two sides means the planner hash-joins WITHOUT help — and the
    * guard is also what stops the rule re-firing on its own (band, key)
    * output inside a fixed-point batch. */
  private def hasEquiConjunct(left: LogicalPlan, right: LogicalPlan,
                              cond: Expression): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) => splitsSides(left, right, a, b)
      case EqualNullSafe(a, b) => splitsSides(left, right, a, b)
      case _ => false
    }

  private def splitsSides(left: LogicalPlan, right: LogicalPlan,
                          a: Expression, b: Expression): Boolean =
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
       (b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)))

  private def eligible(j: Join, left: LogicalPlan, right: LogicalPlan,
                       cond: Expression, minTau: Double): Boolean =
    j.resolved && !hasEquiConjunct(left, right, cond) &&
      conjuncts(cond)
        .exists(c => cosineConjunct(left, right, c, minTau).isDefined)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, nBits: Int, bandBits: Int,
                      seed: Long, minTau: Double): Option[LogicalPlan] = {
    val hit = conjuncts(cond).view
      .flatMap(c => cosineConjunct(left, right, c, minTau))
      .headOption
    hit.map { case (vecL, vecR) =>
      def signed(side: LogicalPlan, vec: Expression, tag: String)
          : (LogicalPlan, Attribute, Attribute, Attribute) = {
        val bandsAlias = Alias(
          SrpBands(vec, nBits, bandBits, seed), s"__srp_bands_$tag")()
        val proj = Project(side.output :+ bandsAlias, side)
        val bandAttr = AttributeReference(s"__srp_band_$tag",
          IntegerType, nullable = false)()
        val keyAttr = AttributeReference(s"__srp_key_$tag",
          LongType, nullable = false)()
        val gen = Generate(PosExplode(bandsAlias.toAttribute),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(bandAttr, keyAttr), proj)
        (gen, bandsAlias.toAttribute, bandAttr, keyAttr)
      }
      val (genL, bandsL, bandL, keyL) = signed(left, vecL, "l")
      val (genR, bandsR, bandR, keyR) = signed(right, vecR, "r")
      val bandJoin = Join(genL, genR, Inner,
        Some(And(EqualTo(bandL, bandR), EqualTo(keyL, keyR))),
        JoinHint.NONE)
      val dedup = EqualTo(FirstEqualBand(bandsL, bandsR), bandL)
      Project(j.output, Filter(And(cond, dedup), bandJoin))
    }
  }
}
