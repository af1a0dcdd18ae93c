package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
import graft.functions.{CosineSimilarity, VectorLshBands}

/** Opt-in AUTO-LADDER rewrite: large cosine-threshold theta joins — the
  * all-pairs embedding-similarity shape Spark can only plan as a
  * broadcast-nested-loop / cartesian join, O(n·m) score evaluations —
  * are rewritten at optimization time into hyperplane-LSH banded
  * EQUI-joins, the same exact→bucketed ladder
  * [[graft.operators.Dedup.embeddingDedup]] walks by row count, applied
  * automatically to any eligible join any way it was written (DataFrame
  * or SQL). This is the structural fix for "the quadratic formulation is
  * still reachable": past the size threshold it no longer is.
  *
  * Eligible: inner join, no cross-side equality conjunct, some conjunct
  * `cosine_sim(a, b) >= t` (or `>`, either operand order) with `a` and
  * `b` from opposite sides, and BOTH sides' size estimates at or above
  * `spark.graft.autoLadder.minBytes` (unset/≤0 = rule off — a genuinely
  * small side makes the broadcast nested loop the right plan, exactly
  * like the brute-force arm of the ANN ladder). Rewrite: each side
  * explodes its [[graft.functions.VectorLshBands]] keys (map-only,
  * band index packed in the key so one long column is the complete
  * key), the join becomes an equi-join on the band key with the
  * ORIGINAL condition as a post-join filter over co-bucketed rows, and
  * a final aggregate over the join's own output collapses the
  * once-per-shared-band multiplicity.
  *
  * APPROXIMATE by design, like [[ApproximateRewrite]]'s AQP rewrites
  * (hence opt-in): a qualifying pair sharing NO band is lost — the
  * standard LSH recall trade, 1 − (1 − p^bits)^bands at sign-agreement
  * probability p = 1 − θ/π. Identical-direction vectors agree on every
  * sign, so exact duplicates always survive; defaults (16 bands × 8
  * bits) target the high-cosine near-dup regime. Duplicate FULL OUTPUT
  * ROWS also collapse (the dedup aggregate cannot tell two identical
  * (left,right) value tuples apart) — pair-finding outputs carry ids,
  * so this is moot there.
  */
case class AutoLadderRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def confLong(key: String, dflt: Long): Long =
    spark.conf.getOption(key).flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(dflt)

  private def minBytes: Long = confLong("spark.graft.autoLadder.minBytes", 0L)
  private def nBands: Int = confLong("spark.graft.autoLadder.bands", 16L).toInt
  private def bits: Int = confLong("spark.graft.autoLadder.bitsPerBand", 8L).toInt
  private def seed: Long = confLong("spark.graft.autoLadder.seed", 42L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = minBytes
    if (threshold <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, threshold).getOrElse(j)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join, threshold: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(j.condition.get)
    def sided(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (sided(a), sided(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case EqualNullSafe(a, b) => (sided(a), sided(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case _ => false
    }
    if (hasEqui) return None

    def vecOk(e: Expression) = e.deterministic && (e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    // cosine_sim(a, b) bounded BELOW by a literal, either operand order
    val pair = conjuncts.collectFirst {
      case cmp @ (_: GreaterThan | _: GreaterThanOrEqual)
          if cmp.asInstanceOf[BinaryComparison].left.isInstanceOf[CosineSimilarity] &&
            cmp.asInstanceOf[BinaryComparison].right.foldable =>
        cmp.asInstanceOf[BinaryComparison].left.asInstanceOf[CosineSimilarity]
      case cmp @ (_: LessThan | _: LessThanOrEqual)
          if cmp.asInstanceOf[BinaryComparison].right.isInstanceOf[CosineSimilarity] &&
            cmp.asInstanceOf[BinaryComparison].left.foldable =>
        cmp.asInstanceOf[BinaryComparison].right.asInstanceOf[CosineSimilarity]
    }
    pair.flatMap { cos =>
      val (a, b) = (cos.left, cos.right)
      if (!vecOk(a) || !vecOk(b)) None
      else (sided(a), sided(b)) match {
        case (Some(x), Some(y)) if x != y =>
          // both sides big? a small side means the nested loop IS the
          // right plan (brute-force arm of the ladder)
          if (j.left.stats.sizeInBytes < threshold ||
              j.right.stats.sizeInBytes < threshold) None
          else {
            val (lv, rv) = if (x) (a, b) else (b, a)
            Some(build(j, lv, rv))
          }
        case _ => None
      }
    }
  }

  private def build(j: Join, lv: Expression, rv: Expression): LogicalPlan = {
    def banded(child: LogicalPlan, v: Expression, name: String): (LogicalPlan, Attribute) = {
      val bandsExpr = VectorLshBands(Seq(v,
        Literal(nBands), Literal(bits), Literal(seed)))
      val attr = AttributeReference(name, LongType, nullable = false)()
      (Generate(Explode(bandsExpr), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(attr), child), attr)
    }
    val (lGen, lAttr) = banded(j.left, lv, "__graft_lshband_l")
    val (rGen, rAttr) = banded(j.right, rv, "__graft_lshband_r")
    val joined = Join(lGen, rGen, Inner,
      Some(And(EqualTo(lAttr, rAttr), j.condition.get)), j.hint)
    // collapse the once-per-shared-band multiplicity back to once
    Aggregate(j.output, j.output, Project(j.output, joined))
  }
}
