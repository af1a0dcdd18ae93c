package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Events, Graph}

/** Hand-computed fixtures for the round-9b additions: Mann-Whitney U
  * (q_mwu), multi-touch attribution (e_attribution_multi), and
  * all-pairs hops / harmonic centrality (g_harmonic). Expected values
  * are recomputed with PLAIN SCALA arithmetic (or literally by hand in
  * the comments), so a bug in the operator can't hide in a shared
  * formula.
  */
class Round9bOpsSpec extends SparkSpec {

  // ------------------------------------------------------ Mann-Whitney

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "tsu", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
  }

  test("mannWhitneyU matches the textbook midrank computation by hand") {
    // click = {1, 2, 3}, view = {2, 4} (dollars). Combined order:
    // 1(A) 2(A,B tie, midrank 2.5) 3(A) 4(B) →
    // R_A = 1 + 2.5 + 4 = 7.5, U_A = 7.5 − 3·4/2 = 1.5, μ = 3,
    // T = 2³−2 = 6, σ² = (6/12)·(6 − 6/20) = 2.85,
    // z = (1.5 − 3)/√2.85
    val ev = eventsDf(Seq(
      (1L, 0L, 1L, "click", 1.0), (2L, 1L, 1L, "click", 2.0),
      (3L, 2L, 1L, "click", 3.0),
      (4L, 3L, 2L, "view", 2.0), (5L, 4L, 2L, "view", 4.0),
      // a decoy type that must not enter the ranking
      (6L, 5L, 3L, "purchase", 100.0)))
    val r = Analytics.mannWhitneyU(ev).collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_stat") == 1.5)
    val expectedZ = math.floor((1.5 - 3.0) / math.sqrt(2.85) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("z_score") == expectedZ)
  }

  test("mannWhitneyU u_stat equals the pairwise-count definition on a random sample") {
    val rnd = new scala.util.Random(42)
    val a = Seq.fill(40)((rnd.nextInt(500) + 1).toDouble / 100.0)
    val b = Seq.fill(55)((rnd.nextInt(500) + 1).toDouble / 100.0)
    val rows = a.zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong, 1L, "click", v) } ++
      b.zipWithIndex.map { case (v, i) =>
        (1000L + i, 1000L + i, 2L, "view", v) }
    val r = Analytics.mannWhitneyU(eventsDf(rows)).collect().head
    // U_A = #{(x_a, x_b): x_a > x_b} + ½·#ties — the definition the
    // rank formula is a shortcut for
    val u = a.map(x => b.map(y =>
      if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum).sum
    assert(r.getAs[Double]("u_stat") == u)
  }

  test("mannWhitneyU: all-tied values report NULL z, exact U") {
    val ev = eventsDf(Seq(
      (1L, 0L, 1L, "click", 5.0), (2L, 1L, 1L, "click", 5.0),
      (3L, 2L, 2L, "view", 5.0)))
    val r = Analytics.mannWhitneyU(ev).collect().head
    // all tied: U_A = ½·n_a·n_b = 1, σ² = 0 → z undefined
    assert(r.getAs[Double]("u_stat") == 1.0)
    assert(r.isNullAt(r.fieldIndex("z_score")))
  }

  test("mannWhitneyU: a missing group and an empty input report NULLs, not errors") {
    val one = Analytics.mannWhitneyU(eventsDf(Seq(
      (1L, 0L, 1L, "click", 1.0)))).collect().head
    assert(one.getAs[Long]("n_a") == 1L && one.getAs[Long]("n_b") == 0L)
    assert(one.isNullAt(one.fieldIndex("u_stat")))
    assert(one.isNullAt(one.fieldIndex("z_score")))
    val empty = Analytics.mannWhitneyU(eventsDf(Seq.empty)).collect().head
    assert(empty.getAs[Long]("n_a") == 0L && empty.getAs[Long]("n_b") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("z_score")))
  }

  // ----------------------------------------------- multi-touch credit

  test("multiTouchAttribution splits credit by hand-checked weights") {
    val base = 1700000000000000L
    val day = 86400000000L
    val ev = eventsDf(Seq(
      // user 1: click, view, click then purchase $10 → n=3:
      // linear 3334/3333/3333 bp (remainder to pos 1);
      // position 4000/2000/4000 bp
      (101L, base, 1L, "click", 0.0),
      (102L, base + 1000L, 1L, "view", 0.0),
      (103L, base + 2000L, 1L, "click", 0.0),
      (104L, base + 3000L, 1L, "purchase", 10.0),
      // user 2: single click → full $20 both schemes
      (201L, base, 2L, "click", 0.0),
      (202L, base + 3600000000L, 2L, "purchase", 20.0),
      // user 3: touch 8 days out → none
      (301L, base, 3L, "view", 0.0),
      (302L, base + 8 * day, 3L, "purchase", 40.0),
      // user 4: no touch at all → none
      (401L, base, 4L, "purchase", 80.0),
      // user 5: click, click, view, view then purchase $100 → n=4:
      // linear 2500 each; position 4000/1000/1000/4000
      (501L, base, 5L, "click", 0.0),
      (502L, base + 1L, 5L, "click", 0.0),
      (503L, base + 2L, 5L, "view", 0.0),
      (504L, base + 3L, 5L, "view", 0.0),
      (505L, base + 4L, 5L, "purchase", 100.0),
      // user 6: touch EXACTLY at the 7-day boundary → excluded (the
      // window lower bound is strict) → none
      (601L, base, 6L, "click", 0.0),
      (602L, base + 7 * day, 6L, "purchase", 12.0),
      // user 7: touch in the SAME µs as the purchase → included
      (701L, base, 7L, "click", 0.0),
      (702L, base, 7L, "purchase", 5.0)))
    val got = Events.multiTouchAttribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    // click: u1 (6.667 lin / 8.00 pos) + u2 (20) + u5 (50) + u7 (5)
    // view:  u1 (3.333 lin / 2.00 pos) + u5 (50)
    // none:  u3 (40) + u4 (80) + u6 (12)
    assert(got.toSeq == Seq(
      ("click", 6L, 81.667, 83.0),
      ("none", 3L, 132.0, 132.0),
      ("view", 3L, 53.333, 52.0)))
  }

  test("multiTouchAttribution: weights sum to exactly the purchase total") {
    // whatever the touch count, per-purchase credit must re-add to the
    // full revenue under BOTH schemes (the remainder rule's whole point)
    val base = 1700000000000000L
    val rows = (1 to 9).flatMap { n =>
      val touches = (0 until n).map(i =>
        (n * 100L + i, base + i, n.toLong, if (i % 2 == 0) "click" else "view", 0.0))
      touches :+ ((n * 100L + 99L, base + 100L, n.toLong, "purchase", 9.99))
    }
    val card = Events.multiTouchAttribution(eventsDf(rows))
      .agg(sum(col("linear_revenue")), sum(col("position_revenue")))
      .collect().head
    assert(math.abs(card.getDouble(0) - 9 * 9.99) < 1e-9)
    assert(math.abs(card.getDouble(1) - 9 * 9.99) < 1e-9)
  }

  test("multiTouchAttribution: empty input yields an empty card") {
    assert(Events.multiTouchAttribution(eventsDf(Seq.empty)).count() == 0)
  }

  // ------------------------------------------- all-pairs hops / harmonic

  private def edgesDf(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  private def nodesDf(names: Seq[String]) = {
    import spark.implicits._
    names.toDF("node")
  }

  test("allPairsHops: driver and distributed routes agree on a hand graph") {
    // a → b → c → d plus a shortcut a → c: dist(a,·) = b:1 c:1 d:2
    val edges = edgesDf(Seq(
      ("a", "b", 5L), ("b", "c", 5L), ("c", "d", 5L), ("a", "c", 3L)))
    val nodes = nodesDf(Seq("a", "b", "c", "d"))
    def run(localMax: Long) =
      Graph.allPairsHops(edges, nodes, localMaxEdges = localMax)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
    val expected = Set(
      ("a", "a", 0L), ("a", "b", 1L), ("a", "c", 1L), ("a", "d", 2L),
      ("b", "b", 0L), ("b", "c", 1L), ("b", "d", 2L),
      ("c", "c", 0L), ("c", "d", 1L),
      ("d", "d", 0L))
    assert(run(10000L) == expected) // driver route
    assert(run(0L) == expected)     // distributed route
  }

  test("allPairsHops converges past depth 8 (the old fixed-round trap)") {
    // an 11-edge chain: n01 → … → n12; distance n01→n12 is 11 — a
    // fixed 8-round loop would silently truncate it
    val names = (1 to 12).map(i => f"n$i%02d")
    val edges = edgesDf(names.zip(names.tail).map { case (a, b) => (a, b, 1L) })
    val byRoute = Seq(10000L, 0L).map { localMax =>
      Graph.allPairsHops(edges, nodesDf(names), localMaxEdges = localMax)
        .where(col("src_node") === "n01" && col("node") === "n12")
        .collect().map(_.getLong(2)).toSeq
    }
    assert(byRoute == Seq(Seq(11L), Seq(11L)))
  }

  test("nationHarmonic covers every nation, zero-reach included") {
    val card = Graph.nationHarmonic(spark, sfDir).collect()
    assert(card.length == 25)
    assert(card.forall(_.getAs[Double]("harmonic") >= 0.0))
    // micro-unit sums: harmonic is always a multiple of 1e-6
    assert(card.forall { r =>
      val h = r.getAs[Double]("harmonic")
      math.abs(h * 1e6 - math.floor(h * 1e6 + 0.5)) < 1e-6
    })
  }

  test("harmonic by hand: chain contributes 1 + 1/2 + 1/3 in micro-units") {
    val edges = edgesDf(Seq(("a", "b", 5L), ("b", "c", 5L), ("c", "d", 5L)))
    val nodes = nodesDf(Seq("a", "b", "c", "d"))
    val hops = Graph.allPairsHops(edges, nodes)
    val h = hops.where(col("hops") > 0L)
      .groupBy(col("src_node"))
      .agg(sum(expr("1000000 div hops")).as("h6"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // floor semantics: 1/3 → 333333, NOT a float residue
    assert(h == Map("a" -> 1833333L, "b" -> 1500000L, "c" -> 1000000L))
  }
}
