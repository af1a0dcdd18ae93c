package graft

import graft.operators.Graph

/** Hand-computed fixtures for the round-7 third-wave operators. */
class Round7cOpsSpec extends SparkSpec {

  // A 4-clique {a,b,c,d} with a pendant path e-f hanging off d: the
  // classic k-core fixture — peeling at k=3 strips f (deg 1), then e
  // (deg 1 after f), leaving the clique where everyone keeps degree 3.
  private def cliquePlusTail = {
    import spark.implicits._
    Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d"),
      ("d","e"),("e","f"))
      .toDF("src", "dst").withColumn("w", org.apache.spark.sql.functions.lit(1L))
  }

  test("kCore peels the pendant tail, keeps the 4-clique at degree 3") {
    val got = Graph.kCore(cliquePlusTail, k = 3, rounds = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq(("a",3L),("b",3L),("c",3L),("d",3L)))
  }

  test("kCore at k above the max clique degree empties") {
    assert(Graph.kCore(cliquePlusTail, k = 4, rounds = 8).count() == 0L)
  }

  test("kCore ignores direction and duplicate/self edges") {
    import spark.implicits._
    // same clique, with reversed duplicates and a self loop thrown in
    val noisy = cliquePlusTail.union(
      Seq(("b","a"),("d","c"),("a","a")).toDF("src","dst")
        .withColumn("w", org.apache.spark.sql.functions.lit(1L)))
    val got = Graph.kCore(noisy, k = 3, rounds = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq(("a",3L),("b",3L),("c",3L),("d",3L)))
  }

  test("neighborJaccard: path a-b-c gives the endpoints jac 1 via b") {
    import spark.implicits._
    // path a-b-c: N(a)={b}, N(c)={b} → pair (a,c): common 1, union 1,
    // jac 1.0, not linked. Pairs (a,b)/(b,c) share no neighbor (a path
    // has no triangles) so only one row comes back.
    val edges = Seq(("a","b"),("b","c")).toDF("src","dst")
      .withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val got = Graph.neighborJaccard(edges).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4), r.getDouble(5)) == ("a", "c", 1L, 1L, false, 1.0))
  }

  test("neighborJaccard on the 4-clique: every pair linked, jac 0.5") {
    import spark.implicits._
    val clique = Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),
      ("c","d")).toDF("src","dst")
      .withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val got = Graph.neighborJaccard(clique)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getDouble(5)))
    // each pair (x,y): N(x)\{y} ∩ N(y)\{x}? no — neighbor sets INCLUDE
    // the partner: N(a)={b,c,d}, N(b)={a,c,d} → common {c,d} = 2,
    // union = 3+3-2 = 4, jac = 0.5
    assert(got.length == 6)
    assert(got.forall { case (_, _, c, u, l, j) =>
      c == 2L && u == 4L && l && j == 0.5 })
  }
}
