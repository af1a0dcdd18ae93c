package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** AutoSaltRewrite: measured-skew-driven join salting. Pins (a) the
  * rewrite fires on a registered hot key and preserves the plain
  * join's values exactly, (b) every no-fire guard — rule off, ratio
  * under threshold, broadcast-able right side, already-salted join —
  * and (c) the end-to-end entry (preflight → rewrite → values). */
class AutoSaltSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // a join whose left key is 'hotkey': 2000 facts over 3 key values,
  // right side a 3-row derived dim (distinct over the facts, so its
  // size ESTIMATE stays fact-derived — big enough to clear the
  // broadcast guard when the guard is off)
  private def facts = spark.range(2000).select(
    (col("id") % 3).as("hotkey"), (col("id") % 97).as("v"))
  private def dim = facts.select(col("hotkey")).distinct()
    .withColumn("label", concat(lit("k"), col("hotkey")))
  private def plainJoin = facts.join(dim, "hotkey")
    .groupBy(col("label")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))

  private def optimizedWithRule(fire: Boolean = true): String = {
    Skew.clearHotKeys(spark)
    Skew.registerHot(spark, "hotkey", if (fire) 10.0 else 1.1)
    var plan = ""
    withConf("spark.graft.autoSalt.factor" -> "4",
      "spark.graft.autoSalt.maxBroadcastBytes" -> "0") {
      plan = plainJoin.queryExecution.optimizedPlan.toString
    }
    Skew.clearHotKeys(spark)
    plan
  }

  test("fires on a registered hot key and keeps values identical") {
    Skew.clearHotKeys(spark)
    Skew.registerHot(spark, "hotkey", 10.0)
    var salted: Set[Row] = Set.empty
    withConf("spark.graft.autoSalt.factor" -> "4",
      "spark.graft.autoSalt.maxBroadcastBytes" -> "0") {
      val df = plainJoin
      assert(df.queryExecution.optimizedPlan.toString.contains("__graft_salt"),
        "rewrite should fire")
      salted = df.collect().toSet
    }
    Skew.clearHotKeys(spark)
    assert(salted == plainJoin.collect().toSet)
  }

  test("ratio below minRatio: no rewrite") {
    assert(!optimizedWithRule(fire = false).contains("__graft_salt"))
  }

  test("rule off (factor unset): no rewrite even with a hot key") {
    Skew.clearHotKeys(spark)
    Skew.registerHot(spark, "hotkey", 10.0)
    assert(!plainJoin.queryExecution.optimizedPlan.toString
      .contains("__graft_salt"))
    Skew.clearHotKeys(spark)
  }

  test("broadcast-able right side: guard blocks the rewrite") {
    Skew.clearHotKeys(spark)
    Skew.registerHot(spark, "r_regionkey", 10.0)
    withConf("spark.graft.autoSalt.factor" -> "4") {
      // region is a tiny parquet leaf: its size estimate sits far under
      // the session broadcast threshold, so salting would only add cost
      val n = Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_regionkey").as("r_regionkey"))
      val r = Tables.region(spark, sfDir)
      val j = n.join(r, "r_regionkey")
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_salt"))
    }
    Skew.clearHotKeys(spark)
  }

  test("hand-salted join is not re-salted (fixed point)") {
    Skew.clearHotKeys(spark)
    Skew.registerHot(spark, "hotkey", 10.0)
    Skew.registerHot(spark, "__graft_salt", 10.0) // worst case: salt key itself hot
    withConf("spark.graft.autoSalt.factor" -> "4",
      "spark.graft.autoSalt.maxBroadcastBytes" -> "0") {
      val hand = Skew.saltedJoin(
        facts, dim.withColumnRenamed("label", "lbl"), "hotkey", 4)
      val plan = hand.queryExecution.optimizedPlan.toString
      // exactly the hand salt's one replication, not a second layer
      assert(!plan.contains("__graft_salt_l"))
    }
    Skew.clearHotKeys(spark)
  }

  test("preflight measures and registers the fs_skew ratio") {
    Skew.clearHotKeys(spark)
    val ratio = Skew.preflight(facts, "hotkey")
    // 3 keys over 32 buckets: the hottest bucket carries ≥ 1/3 of rows
    assert(ratio >= 4.0)
    assert(Skew.hotRatio(spark, "HOTKEY").contains(ratio))
    Skew.clearHotKeys(spark)
  }

  test("entry: auto-salted flag revenue equals the plain aggregate") {
    val li = Tables.lineitem(spark, sfDir)
    val auto = Skew.autoSaltedFlagRevenue(li, factor = 4).collect().toSet
    val plain = li.groupBy(concat(lit("flag_"), col("l_returnflag")).as("flag_label"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(graft.functions.Exact.cents(col("l_extendedprice")))
          .cast("double") / 100.0).as("revenue"))
      .collect().toSet
    // the demo unregisters its own measurement: nothing stays armed
    assert(Skew.hotRatio(spark, "l_returnflag").isEmpty)
    assert(auto == plain)
  }

  test("registry is session-scoped: another session's preflight never fires here") {
    Skew.clearHotKeys(spark)
    val other = spark.newSession()
    Skew.registerHot(other, "hotkey", 10.0)
    withConf("spark.graft.autoSalt.factor" -> "4",
      "spark.graft.autoSalt.maxBroadcastBytes" -> "0") {
      assert(!plainJoin.queryExecution.optimizedPlan.toString
        .contains("__graft_salt"))
    }
    // ...and the measurement is still live in ITS session
    assert(Skew.hotRatio(other, "hotkey").contains(10.0))
    Skew.clearHotKeys(other)
  }

  test("scoped registration fires only on attributes with that qualifier") {
    Skew.clearHotKeys(spark)
    Skew.registerHot(spark, "hotkey", 10.0, scope = Some("f"))
    withConf("spark.graft.autoSalt.factor" -> "4",
      "spark.graft.autoSalt.maxBroadcastBytes" -> "0") {
      // same-named key, NO 'f' qualifier: table-B collision, no fire
      assert(!plainJoin.queryExecution.optimizedPlan.toString
        .contains("__graft_salt"))
      // the preflighted table joined under its alias: fires
      val aliased = facts.alias("f").join(dim, "hotkey")
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
      assert(aliased.queryExecution.optimizedPlan.toString
        .contains("__graft_salt"))
    }
    Skew.clearHotKeys(spark)
  }

  test("oversized right side: the replication cap blocks the rewrite") {
    Skew.clearHotKeys(spark)
    Skew.registerHot(spark, "hotkey", 10.0)
    withConf("spark.graft.autoSalt.factor" -> "4",
      "spark.graft.autoSalt.maxBroadcastBytes" -> "0",
      "spark.graft.autoSalt.maxReplicatedBytes" -> "1") {
      // every real frame's estimate exceeds 1 byte: replicating it
      // xfactor would multiply the dominant shuffle, so no fire
      assert(!plainJoin.queryExecution.optimizedPlan.toString
        .contains("__graft_salt"))
    }
    Skew.clearHotKeys(spark)
  }
}
