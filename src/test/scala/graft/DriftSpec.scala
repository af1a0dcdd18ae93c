package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Corpus drift card: exact-integer TVD between two snapshots per
  * monitored feature, plus the live streamed twin. The numerator
  * Σ|n_b·tot_c − n_c·tot_b| is integer arithmetic, so every expected
  * value here is computable by hand. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def card(base: Seq[String], cur: Seq[String]) =
    TextAnalysis.driftCard(base.toDF("f"), cur.toDF("f"), Seq("f" -> col("f")))
      .collect().head

  test("hand-computed TVD: 3:1 vs 1:3 mix drifts by exactly 0.5") {
    val r = card(Seq("a", "a", "a", "b"), Seq("a", "b", "b", "b"))
    assert(r.getString(0) == "f")
    assert(r.getLong(1) == 2L)          // n_cat
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L)
    assert(r.getDouble(4) == 0.5)       // tvd
    assert(r.getString(5) == "b")       // tie on diff -> largest category
    assert(r.getDouble(6) == 0.5)       // top_shift
  }

  test("identical snapshots: zero drift") {
    val r = card(Seq("a", "b", "b"), Seq("a", "b", "b"))
    assert(r.getDouble(4) == 0.0 && r.getDouble(6) == 0.0)
  }

  test("disjoint categories: maximal drift 1.0") {
    val r = card(Seq("a", "a"), Seq("b", "c"))
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(4) == 1.0)
  }

  test("null categories fold into the ∅ bucket") {
    val base = Seq(Some("a"), None, None).toDF("f")
    val cur = Seq(Some("a"), Some("a"), None).toDF("f")
    val r = TextAnalysis.driftCard(base, cur, Seq("f" -> col("f")))
      .collect().head
    assert(r.getLong(1) == 2L) // a and ∅ only
    // n_b: a=1 ∅=2, n_c: a=2 ∅=1 → sum_diff = |1·3−2·3| + |2·3−1·3| = 6
    // tvd = 6 / (2·3·3) = 1/3
    assert(r.getDouble(4) == math.floor(6.0 / 18.0 * 1e6 + 0.5) / 1e6)
  }

  test("one card row per monitored feature, in declaration order") {
    val docs = Tables.documents(spark, sfDir)
    val c = TextAnalysis.driftCard(
      docs.where(pmod(col("doc_id"), lit(2L)) === 0),
      docs.where(pmod(col("doc_id"), lit(2L)) === 1),
      Seq("lang" -> col("lang"), "source" -> col("source")))
    assert(c.select("feature").as[String].collect().toSeq == Seq("lang", "source"))
    val tvds = c.select("tvd").as[Double].collect()
    assert(tvds.forall(t => t >= 0.0 && t <= 1.0))
  }

  test("streamed drift card equals the batch card and is split-invariant") {
    val ev = Tables.events(spark, sfDir)
    val batch = TextAnalysis.driftCard(
        ev.where(pmod(col("user_id"), lit(2L)) === 0),
        ev.where(pmod(col("user_id"), lit(2L)) === 1),
        Seq("event_type" -> col("event_type")))
      .collect().head
    val one = graft.streaming.EventStream
      .driftMaintenanceReplay(spark, sfDir, maxFilesPerTrigger = 1)
      .collect().head
    val nine = graft.streaming.EventStream
      .driftMaintenanceReplay(spark, sfDir, maxFilesPerTrigger = 9)
      .collect().head
    assert(one == batch, s"stream $one vs batch $batch")
    assert(nine == batch, s"stream $nine vs batch $batch")
  }
}
