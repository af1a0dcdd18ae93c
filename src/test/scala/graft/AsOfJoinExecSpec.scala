package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** The custom physical as-of operator. Ground truth is the composed
  * (tagged-union + running-struct-max) operator, which is itself
  * oracle-verified — equality on real event data plus adversarial
  * shapes (ties, no-match keys, multi-payload) is the gate.
  */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  test("exec operator equals the composed asOf on real events") {
    val events = Tables.events(spark, sfDir)
    val exec = AsOfJoin.purchaseAttributionExec(events)
      .as[(Long, Long, Option[Long])].collect().toSet
    val composed = AsOfJoin.purchaseAttribution(events)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(exec == composed && exec.nonEmpty)
  }

  test("physical plan is the custom exec with one co-partitioning exchange per side") {
    val events = Tables.events(spark, sfDir)
    val plan = AsOfJoin.purchaseAttributionExec(events)
      .queryExecution.executedPlan.toString
    // physical nodes print with the Exec suffix stripped; a leading
    // `!` would mark unresolved/missing-input nodes
    assert(plan.contains("AsOfJoin"), s"expected custom exec:\n$plan")
    assert(!plan.contains("!AsOfJoin"), s"exec node must be valid:\n$plan")
    assert(!plan.contains("Window"), "no window buffering in the exec path")
  }

  test("ties, missing matches, and multi-payload match the composed operator") {
    val left = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"), (3L, 10L, "d"))
      .toDF("k", "lts", "ltag")
    // key 1: two right rows at the SAME ts 100 (payload tie → greater
    // payload wins); key 2: only future rows (no match); key 3: none
    val right = Seq(
      (1L, 100L, 7L), (1L, 100L, 9L), (1L, 150L, 5L), (2L, 60L, 1L))
      .toDF("k", "rts", "pay")
    val exec = AsOfJoin.asOfExec(left, right, "k", "lts", "rts", Seq("pay"))
      .select($"k", $"lts", $"asof_pay").as[(Long, Long, Option[Long])]
      .collect().toSet
    val composed = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("pay"))
      .select($"k", $"lts", $"asof_pay").as[(Long, Long, Option[Long])]
      .collect().toSet
    assert(exec == composed)
    assert(exec == Set((1L, 100L, Some(9L)), (1L, 200L, Some(5L)),
      (2L, 50L, None), (3L, 10L, None)))
  }

  test("randomized equivalence with the composed operator") {
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(500)((rnd.nextInt(20).toLong, rnd.nextInt(100).toLong))
      .toDF("k", "lts")
    val right = Seq.fill(500)(
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "rts", "pay")
    val exec = AsOfJoin.asOfExec(left, right, "k", "lts", "rts", Seq("pay"))
      .groupBy($"k", $"lts", $"asof_pay").count()
      .as[(Long, Long, Option[Long], Long)].collect().toSet
    val composed = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("pay"))
      .groupBy($"k", $"lts", $"asof_pay").count()
      .as[(Long, Long, Option[Long], Long)].collect().toSet
    assert(exec == composed)
  }
}

class AsOfJoinExecForwardSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.AsOfJoin

  test("forward exec equals the composed asOfForward on real events") {
    val events = Tables.events(spark, sfDir)
    val exec = AsOfJoin.viewNextPurchaseExec(events)
      .as[(Long, Long, Option[Long])].collect().toSet
    val composed = AsOfJoin.viewNextPurchase(events)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(exec == composed && exec.nonEmpty)
  }

  test("forward ties pick the MIN payload (struct-min parity)") {
    val left = Seq((1L, 100L), (2L, 500L)).toDF("k", "lts")
    // key 1: two right rows at the same future ts (min payload must
    // win); a nearer row at 150 beats both; key 2: only past rows
    val right = Seq((1L, 200L, 9L), (1L, 200L, 7L), (1L, 150L, 5L), (2L, 400L, 1L))
      .toDF("k", "rts", "pay")
    val exec = AsOfJoin.asOfExecForward(left, right, "k", "lts", "rts", Seq("pay"))
      .select($"k", $"lts", $"asofnext_pay").as[(Long, Long, Option[Long])]
      .collect().toSet
    val composed = AsOfJoin.asOfForward(left, right, "k", "lts", "rts", Seq("pay"))
      .select($"k", $"lts", $"asofnext_pay").as[(Long, Long, Option[Long])]
      .collect().toSet
    assert(exec == composed)
    assert(exec == Set((1L, 100L, Some(5L)), (2L, 500L, None)))
  }

  test("randomized forward equivalence") {
    val rnd = new scala.util.Random(11)
    val left = Seq.fill(400)((rnd.nextInt(15).toLong, rnd.nextInt(80).toLong))
      .toDF("k", "lts")
    val right = Seq.fill(400)(
      (rnd.nextInt(15).toLong, rnd.nextInt(80).toLong, rnd.nextInt(100).toLong))
      .toDF("k", "rts", "pay")
    val exec = AsOfJoin.asOfExecForward(left, right, "k", "lts", "rts", Seq("pay"))
      .groupBy($"k", $"lts", $"asofnext_pay").count()
      .as[(Long, Long, Option[Long], Long)].collect().toSet
    val composed = AsOfJoin.asOfForward(left, right, "k", "lts", "rts", Seq("pay"))
      .groupBy($"k", $"lts", $"asofnext_pay").count()
      .as[(Long, Long, Option[Long], Long)].collect().toSet
    assert(exec == composed)
  }
}

class AsOfJoinExecGuardSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.AsOfJoin

  test("mismatched key types are rejected (hash partitioning is type-sensitive)") {
    val left = Seq((1, 10L)).toDF("k", "lts")          // k: Int
    val right = Seq((1L, 5L, 7L)).toDF("k", "rts", "pay") // k: Long
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfExec(left, right, "k", "lts", "rts", Seq("pay"))
    }
    assert(e.getMessage.contains("same type"))
  }

  test("null keys and timestamps are dropped, not matched as zero") {
    val left = Seq((Some(0L), Some(10L), "zero-key"), (None, Some(10L), "null-key"),
      (Some(1L), None, "null-ts")).toDF("k", "lts", "tag")
    val right = Seq((Some(0L), Some(5L), Some(77L)), (None, Some(5L), Some(99L)))
      .toDF("k", "rts", "pay")
    val out = AsOfJoin.asOfExec(left, right, "k", "lts", "rts", Seq("pay"))
      .select($"tag", $"asof_pay").as[(String, Option[Long])].collect().toMap
    // null-key/null-ts LEFT rows are dropped entirely; the zero-key row
    // must match only the zero-key right row, never the null-key one
    assert(out == Map("zero-key" -> Some(77L)))
  }
}
