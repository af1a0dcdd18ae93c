package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Opt-in range-join optimization: inner joins whose condition is ONLY
  * range predicates (a point expression on one side bounded below and
  * above by expressions from the other side — the point-in-interval
  * shape) are exactly what Spark can only plan as a nested-loop /
  * cartesian join, the classic 100 TB cliff. With
  * `spark.graft.rangeJoin.bucket = <width>` set, this rule rewrites
  * them into binned equi-joins at optimization time:
  *
  *   - the point side gains `cell = floor(point / width)`
  *   - the interval side explodes into one row per covered cell
  *     (`sequence(floor(lo/width), floor(hi/width))`)
  *   - the join becomes an EQUI-join on cell, with the ORIGINAL
  *     condition kept as a post-join filter over co-partitioned rows
  *
  * Exactly [[graft.operators.Events.intervalJoin]]'s manual recipe,
  * applied automatically to any eligible join in any query. Inner-join
  * multiplicity is preserved exactly: a point lies in precisely ONE
  * cell, so each qualifying (point, interval) pair meets in exactly one
  * bucket — no duplicate elimination needed. Extra conjuncts are safe
  * (they re-apply post-join); joins that already carry an equality
  * conjunct are left alone (Spark plans those as hash/sort-merge joins
  * already, and the AQE skew machinery handles them better than an
  * extra explode would). Shuffle cost is O(points + Σ span/width);
  * width tunes the explode factor vs bucket selectivity.
  *
  * Bounds must be integral types (epoch micros are the expected
  * currency); everything is cast to long. `floor` division (via pmod),
  * not truncation, so negative domains bucket correctly.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  // malformed conf = disabled, not a NumberFormatException from inside
  // the optimizer on EVERY query in the session
  private def bucket: Long =
    spark.conf.getOption("spark.graft.rangeJoin.bucket")
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(0L)

  /** Hard ceiling on cells per interval: an interval spanning more than
    * this many buckets raises a clear error at execution instead of
    * materializing a multi-gigabyte per-row array (mis-sized width vs
    * the data's time scale — e.g. width 1 µs under day-long intervals —
    * is a configuration bug, and a silent OOM would hide it). */
  private def maxCells: Long =
    spark.conf.getOption("spark.graft.rangeJoin.maxCellsPerInterval")
      .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(4096L)

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val b = bucket
    if (b <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, b).getOrElse(j)
    }
  }

  /** lower ⟺ `point >= bound` (or >), upper ⟺ `point <= bound` (or <);
    * both imply containment of the point's cell in the bound's cell
    * range, which is all the binning needs. */
  private case class Bound(point: Expression, bound: Expression, isLower: Boolean)

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(j.condition.get)
    def sided(e: Expression): Option[Boolean] = // Some(true)=left, Some(false)=right
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    // an existing cross-side equality conjunct → already an equi-join
    // (EqualNullSafe counts too: Spark extracts <=> as a hash-join key,
    // so rewriting such a join would add a pointless interval explode
    // and forfeit AQE skew handling)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, bb) => (sided(a), sided(bb)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case EqualNullSafe(a, bb) => (sided(a), sided(bb)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case _ => false
    }
    if (hasEqui) return None

    def ok(e: Expression) = integral.contains(e.dataType) && e.deterministic
    val bounds = conjuncts.flatMap {
      case cmp: BinaryComparison if ok(cmp.left) && ok(cmp.right) =>
        (sided(cmp.left), sided(cmp.right)) match {
          case (Some(x), Some(y)) if x != y => cmp match {
            case _: GreaterThan | _: GreaterThanOrEqual => Seq(
              Bound(cmp.left, cmp.right, isLower = true),
              Bound(cmp.right, cmp.left, isLower = false))
            case _: LessThan | _: LessThanOrEqual => Seq(
              Bound(cmp.left, cmp.right, isLower = false),
              Bound(cmp.right, cmp.left, isLower = true))
            case _ => Nil
          }
          case _ => Nil
        }
      case _ => Nil
    }
    // a point expression bounded on BOTH sides by the other side
    val candidates = bounds.groupBy(_.point.canonicalized)
    val pick = candidates.values.find(bs =>
      bs.exists(_.isLower) && bs.exists(!_.isLower))
    pick.flatMap { bs =>
      val point = bs.head.point
      val lo = bs.find(_.isLower).get.bound
      val hi = bs.find(!_.isLower).get.bound
      sided(point).map { pointOnLeft =>
        build(j, point, lo, hi, pointOnLeft, width)
      }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** floor(x / width) over longs: (x - pmod(x, width)) div width. */
  private def cellOf(e: Expression, width: Long): Expression = {
    val x = Cast(e, LongType)
    val w = Literal(width)
    IntegralDivide(Subtract(x, Pmod(x, w)), w)
  }

  private def build(j: Join, point: Expression, lo: Expression,
      hi: Expression, pointOnLeft: Boolean, width: Long): LogicalPlan = {
    val (pointPlan, intervalPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    val pCellAlias = Alias(cellOf(point, width), "__graft_pcell")()
    val pointSide = Project(pointPlan.output :+ pCellAlias, pointPlan)

    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved (the analyzer pass that fills it has already
    // run by optimization time), so set it here. The stop expression
    // raises a descriptive error when one interval would cover more
    // than maxCells buckets (see [[maxCells]]) — RaiseError throws
    // before the Cast returns, so the Long branch type is only formal.
    // A REVERSED interval (lo > hi, corrupt data) would otherwise make
    // step-less Sequence default to step -1 and generate the full
    // DESCENDING range — an arbitrarily large per-row array the maxCells
    // guard (which only checks hi - lo) never sees. The predicate
    // `point >= lo AND point <= hi` is unsatisfiable for such a row, so
    // it maps to the EMPTY cell array: zero join rows, zero memory.
    val cellLo = cellOf(lo, width)
    val cellHi = cellOf(hi, width)
    val guardedHi = If(GreaterThan(Subtract(cellHi, cellLo), Literal(maxCells)),
      Cast(new RaiseError(Literal(
        s"graft range-join: interval spans more than $maxCells cells at bucket width " +
          s"$width — raise spark.graft.rangeJoin.bucket (or maxCellsPerInterval)")),
        LongType),
      cellHi)
    val seq = If(GreaterThan(cellLo, cellHi),
      Literal.create(Array.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)),
      new Sequence(cellLo, guardedHi, None)
        .withTimeZone(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    val iCellAttr = AttributeReference("__graft_icell", LongType, nullable = false)()
    val intervalSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(iCellAttr), intervalPlan)

    val (newLeft, newRight) =
      if (pointOnLeft) (pointSide, intervalSide) else (intervalSide, pointSide)
    val cellEq = EqualTo(pCellAlias.toAttribute, iCellAttr)
    val joined = Join(newLeft, newRight, Inner,
      Some(And(cellEq, j.condition.get)), j.hint)
    Project(j.output, joined)
  }
}
