package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Independent driver-side oracles for the round-9 TPC-H completions
  * (`q2_min_cost`, `q11_important`, `q20_promo` — the last three of
  * the 22-query family). Each test recomputes the full expected result
  * in plain Scala from the collected sf0.001 tables (6k lineitems) and
  * compares SETS — a genuinely different evaluation path from the
  * Catalyst plans under test (the DuckDB driver gate then proves the
  * same results cross-engine at sf0.01).
  */
class Round9TpchSpec extends SparkSpec {

  private def centsOf(x: Double): Long = math.round(x * 100)

  private lazy val lines: Array[(Long, Long, Long, Double, Int)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_quantity"), year(col("l_shipdate")).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), centsOf(r.getDouble(2)),
        r.getDouble(3), r.getInt(4)))

  /** suppkey → (name, acctbal, nation name, region key). */
  private lazy val suppNation: Map[Long, (String, Double, String, Int)] = {
    val nations = Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    Tables.supplier(spark, sfDir).collect().map { r =>
      val (nName, rk) = nations(r.getInt(2))
      r.getLong(0) -> (r.getString(1), r.getDouble(3), nName, rk)
    }.toMap
  }

  private lazy val euroRegionKey: Int =
    Tables.region(spark, sfDir).where(col("r_name") === "EUROPE")
      .collect().head.getInt(0)

  test("q2_min_cost: hand recompute of the cheapest euro supplier per part") {
    val parts = Tables.part(spark, sfDir)
      .where(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val euro = suppNation.filter { case (_, (_, _, _, rk)) => rk == euroRegionKey }
    val pairCost = lines.groupBy(l => (l._1, l._2))
      .map { case ((pk, sk), ls) => (pk, sk, ls.map(_._3).min) }
    val expected = pairCost
      .filter(p => parts.contains(p._1) && euro.contains(p._2))
      .groupBy(_._1)
      .map { case (pk, cands) =>
        val (_, sk, cost) = cands.minBy(c => (c._3, c._2))
        val (sn, bal, nn, _) = euro(sk)
        (bal, sn, nn, pk, parts(pk), cost.toDouble / 100.0)
      }.toSet
    val got = Analytics.q2MinCostSupplier(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getDouble(5))).toSet
    assert(expected.nonEmpty && got == expected)
  }

  test("q11_important: exact-cents threshold membership at the boundary") {
    val suppN = suppNation.filter { case (_, (_, _, nn, _)) => nn == "NATION_3" }.keySet
    val vals = lines.filter(l => suppN(l._2))
      .groupBy(_._1).map { case (pk, ls) => pk -> ls.map(_._3).sum }
    val total = vals.values.sum
    val expected = vals.filter { case (_, v) => v * 1000 > total }
      .map { case (pk, v) => (pk, v.toDouble / 100.0) }.toSet
    val got = Analytics.q11ImportantStock(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(expected.nonEmpty && got == expected)
    // the complement really is excluded — the cross-multiplied compare
    // admits no strictly-below-threshold part
    assert(vals.filter { case (_, v) => v * 1000 <= total }
      .keySet.intersect(got.map(_._1)).isEmpty)
  }

  test("q20_promo: suppliers with a pair whose all-time qty > 2x promo-year qty") {
    val boltParts = Tables.part(spark, sfDir)
      .where(col("p_name").contains("bolt"))
      .collect().map(_.getLong(0)).toSet
    val qualifying = lines.filter(l => boltParts(l._1))
      .groupBy(l => (l._1, l._2))
      .map { case ((_, sk), ls) =>
        val avail = ls.map(_._4.toLong).sum
        val shipped = ls.filter(_._5 == 1997).map(_._4.toLong).sum
        (sk, avail, shipped)
      }
      .collect { case (sk, avail, shipped) if shipped > 0 && avail > 2 * shipped => sk }
      .toSet
    val expected = qualifying.map { sk =>
      val (sn, bal, nn, _) = suppNation(sk)
      (sk, sn, bal, nn)
    }
    val got = Analytics.q20PotentialPromo(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(expected.nonEmpty && got == expected)
  }
}
