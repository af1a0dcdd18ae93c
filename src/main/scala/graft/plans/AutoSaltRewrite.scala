package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.operators.Skew

/** Opt-in AUTO-SALT rewrite: inner equi-joins on a key whose shuffle
  * skew was MEASURED hot ([[Skew.preflight]] → the `fs_skew` bucket
  * card → [[Skew.hotRatio]]) are rewritten at optimization time into
  * the salted form [[Skew.saltedJoin]] spells by hand — the left
  * (probe) side gains a position-derived salt in [0, factor), the
  * right side is replicated once per salt value, and the join key
  * grows the salt equality, so the hot key's rows spread over `factor`
  * reducers instead of pinning one. Semantically IDENTICAL to the
  * plain join (every left row carries exactly one salt; the right side
  * is salt-complete), which is what `q_salted_auto`'s plain-join
  * oracle verifies.
  *
  * This is the detect→rewrite→re-verify pattern of [[AutoLadderRewrite]]
  * applied to skew: the DECLARED plan stays the obvious join, the
  * measurement lives in a preflight card (one bounded pass, run once
  * per key, reusable across every later query), and the rewrite fires
  * only where the measurement says the shuffle would be pinned.
  *
  * Eligible: `spark.graft.autoSalt.factor` > 1 (unset = rule off);
  * inner join with a cross-side `AttributeReference = AttributeReference`
  * conjunct whose LEFT-side attribute name has a registered ratio ≥
  * `spark.graft.autoSalt.minRatio` (default 4.0 — below that AQE's
  * skew-join splitting is the cheaper fix and the replication isn't
  * worth paying); the right side's size estimate is ABOVE
  * `spark.graft.autoSalt.maxBroadcastBytes` (default: the session's
  * autoBroadcastJoinThreshold — a broadcast-able right side means the
  * plain plan has no shuffled build to skew, so salting would only add
  * cost; 0 disables the guard for already-measured cases) and BELOW
  * `spark.graft.autoSalt.maxReplicatedBytes` (default 64 MiB — the
  * rewrite replicates the right side ×factor, so past this cap the
  * added shuffle outweighs the pinned reducer; big-big skewed joins
  * belong to AQE's runtime skew split). Joins already carrying a salt
  * attribute are skipped, which also makes the rule a fixed point.
  * The registry is per-session, and a registration made with a scope
  * fires only on attributes qualified with it (see [[Skew.preflight]]).
  */
case class AutoSaltRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def confLong(key: String, dflt: Long): Long =
    spark.conf.getOption(key)
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(dflt)
  private def confDouble(key: String, dflt: Double): Double =
    spark.conf.getOption(key)
      .flatMap(v => scala.util.Try(v.toDouble).toOption).getOrElse(dflt)

  private def factor: Int = confLong("spark.graft.autoSalt.factor", 0L).toInt
  private def minRatio: Double =
    confDouble("spark.graft.autoSalt.minRatio", 4.0)
  private def maxBroadcastBytes: Long =
    confLong("spark.graft.autoSalt.maxBroadcastBytes",
      confLong("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024))
  private def maxReplicatedBytes: Long =
    confLong("spark.graft.autoSalt.maxReplicatedBytes", 64L * 1024 * 1024)

  private val SaltName = "__graft_salt"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val f = factor
    if (f <= 1) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, f).getOrElse(j)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join, f: Int): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(j.condition.get)
    // already salted — by an earlier pass (__graft_salt) or by hand
    // (Skew.saltedJoin's __salt): fixed point, never a second layer
    if (conjuncts.exists(_.references.exists(a =>
        a.name.startsWith(SaltName) || a.name.startsWith("__salt"))))
      return None
    // a broadcast-able right side means no shuffled build to skew
    val guard = maxBroadcastBytes
    if (guard > 0 && j.right.stats.sizeInBytes <= guard) return None
    // ...and a LARGE right side must not be replicated ×factor: the
    // rewrite multiplies the build side's shuffle volume, so past this
    // cap the cure costs more than the pinned reducer it treats (AQE's
    // runtime skew split is the right tool for big-big joins)
    val cap = maxReplicatedBytes
    if (cap > 0 && j.right.stats.sizeInBytes > cap) return None
    def armed(a: AttributeReference) =
      Skew.hotRatio(spark, a.name, a.qualifier).exists(_ >= minRatio)
    val hotKey = conjuncts.collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) &&
            armed(a) => ()
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) &&
            armed(a) => ()
    }
    hotKey.map { _ =>
      // left: position-derived salt (content hash would funnel identical
      // hot rows to ONE salt — see Skew.saltColumn's rationale)
      val saltExpr = Pmod(MonotonicallyIncreasingID(), Literal(f.toLong))
      val lAlias = Alias(saltExpr, s"${SaltName}_l")()
      val lProj = Project(j.left.output :+ lAlias, j.left)
      // right: replicated once per salt value
      val rAttr = AttributeReference(s"${SaltName}_r",
        org.apache.spark.sql.types.LongType, nullable = false)()
      val rGen = Generate(
        Explode(CreateArray((0 until f).map(i => Literal(i.toLong)))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rAttr), child = j.right)
      val cond = And(j.condition.get, EqualTo(lAlias.toAttribute, rAttr))
      Project(j.output, Join(lProj, rGen, Inner, Some(cond), j.hint))
    }
  }
}
