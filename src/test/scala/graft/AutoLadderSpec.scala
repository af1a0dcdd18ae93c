package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The auto-ladder: (a) the opt-in [[graft.plans.AutoLadderRewrite]]
  * optimizer rule that turns large cosine-threshold theta joins (the
  * BNLJ all-pairs shape) into hyperplane-LSH banded equi-joins for
  * DataFrame AND SQL users, and (b) the size-routed entry points
  * ([[Dedup.nearDupAuto]] / [[Dedup.containmentAuto]]) that walk
  * exact→LSH/capped ladders by corpus size. Together they retire the
  * "quadratic formulation is still reachable at scale" caveat.
  */
class AutoLadderSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.CosineSimilarity.cosineSim

  private val minBytesKey = "spark.graft.autoLadder.minBytes"

  private def withAutoLadder[A](minBytes: Long)(f: => A): A = {
    spark.conf.set(minBytesKey, minBytes.toString)
    try f finally spark.conf.unset(minBytesKey)
  }

  /** 400 random 64-dim vectors; ids 0..19 are duplicated (scaled ×2,
    * cosine exactly 1 and IDENTICAL sign pattern, so every LSH band
    * matches — the rewrite can never lose them) as ids 1000..1019. */
  private lazy val vecs: org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(7)
    val base = (0 until 400).map { i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian()))
    }
    val planted = base.take(20).map { case (i, v) =>
      (1000L + i, v.map(_ * 2.0))
    }
    (base ++ planted).toDF("vec_id", "v")
  }

  private def thetaJoin = {
    val a = vecs.select($"vec_id".as("id_a"), $"v".as("va"))
    val b = vecs.select($"vec_id".as("id_b"), $"v".as("vb"))
    a.join(b, $"id_a" < $"id_b" && cosineSim($"va", $"vb") >= 0.9)
      .select($"id_a", $"id_b")
  }

  test("rule is inert without the conf: the theta join stays a nested loop") {
    val plan = thetaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("NestedLoop") || plan.contains("Cartesian"), plan)
  }

  test("big cosine-threshold theta joins become banded equi-joins (no BNLJ), keeping all exact-dup pairs") {
    val naive = thetaJoin.as[(Long, Long)].collect().toSet
    withAutoLadder(1000L) {
      val plan = thetaJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"expected banded equi-join:\n$plan")
      assert(plan.contains("Generate"), "band explode missing")
      val ladder = thetaJoin.as[(Long, Long)].collect().toSet
      // LSH output is a subset of the exact pair set...
      assert(ladder.subsetOf(naive))
      // ...and identical-direction pairs are NEVER lost
      val planted = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
      assert(planted.subsetOf(ladder), s"lost planted pairs: ${planted -- ladder}")
    }
  }

  test("the SQL formulation of the same join is rewritten too") {
    vecs.createOrReplaceTempView("autoladder_e")
    val q = """SELECT a.vec_id AS id_a, b.vec_id AS id_b
               FROM autoladder_e a JOIN autoladder_e b
               ON a.vec_id < b.vec_id AND cosine_sim(a.v, b.v) >= 0.9"""
    withAutoLadder(1000L) {
      val df = spark.sql(q)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"SQL path not rewritten:\n$plan")
      val planted = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
      val got = df.as[(Long, Long)].collect().toSet
      assert(planted.subsetOf(got))
    }
  }

  test("a small side keeps the broadcast nested loop (the right plan there)") {
    // threshold above both sides' size estimate → untouched
    withAutoLadder(1L << 40) {
      val plan = thetaJoin.queryExecution.executedPlan.toString
      assert(plan.contains("NestedLoop") || plan.contains("Cartesian"), plan)
    }
  }

  test("joins that already carry an equi key are left alone") {
    val a = vecs.select($"vec_id".as("id_a"), ($"vec_id" % 7).as("ka"), $"v".as("va"))
    val b = vecs.select($"vec_id".as("id_b"), ($"vec_id" % 7).as("kb"), $"v".as("vb"))
    withAutoLadder(1000L) {
      val j = a.join(b, $"ka" === $"kb" && cosineSim($"va", $"vb") >= 0.9)
      assert(!j.queryExecution.executedPlan.toString.contains("Generate"))
    }
  }
}

class AutoLadderRoutingSpec extends SparkSpec {
  import graft.operators.Similarity

  test("nearDupAuto takes the exact arm at small size — bit-identical to ngramJaccard") {
    val docs = Tables.documents(spark, sfDir)
    val auto = Dedup.nearDupAuto(docs).collect().map(_.toSeq).toSet
    val exact = Dedup.ngramJaccard(docs, 3, 0.5).collect().map(_.toSeq).toSet
    assert(auto == exact && auto.nonEmpty)
  }

  test("nearDupAuto walks the LSH ladder past exactMaxRows — bit-identical to minhashLsh") {
    val docs = Tables.documents(spark, sfDir)
    val auto = Dedup.nearDupAuto(docs, exactMaxRows = 10).collect().map(_.toSeq).toSet
    val lsh = Dedup.minhashLsh(docs, 3, 64, 16, 0.5, maxBucket = 1000)
      .collect().map(_.toSeq).toSet
    assert(auto == lsh && auto.nonEmpty)
  }

  test("nearDupAuto's LSH arm plans no nested loop or cartesian product") {
    val docs = Tables.documents(spark, sfDir)
    val plan = Dedup.nearDupAuto(docs, exactMaxRows = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("containmentAuto routes and the capped arm stays a subset with true denominators") {
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.containmentPairs(docs, 3, 0.6).collect().map(_.toSeq).toSet
    val small = Dedup.containmentAuto(docs).collect().map(_.toSeq).toSet
    assert(small == exact)
    val capped = Dedup.containmentAuto(docs, exactMaxRows = 10, maxBucket = 1000)
      .collect().map(_.toSeq).toSet
    // capping only DROPS candidate-generating postings; every kept pair
    // carries its exact containment value (true sizes), so the capped
    // result is a value-exact subset
    assert(capped.subsetOf(exact) && capped.nonEmpty)
  }

  test("embeddingDedup (the routed d_dedup_embed entry) equals the exact baseline at driver scale") {
    val e = Tables.embeddings(spark, sfDir)
    val routed = Dedup.embeddingDedup(e, 0.4).collect().map(_.toSeq).toSet
    val exact = Dedup.embeddingNearDup(e, 0.4).collect().map(_.toSeq).toSet
    assert(routed == exact && routed.nonEmpty)
    // and past the row cap it becomes the cell-bounded semantic path
    val cellPlan = Dedup.embeddingDedup(e, 0.4, exactMaxRows = 10)
      .queryExecution.executedPlan.toString
    assert(!cellPlan.contains("NestedLoop") && !cellPlan.contains("Cartesian"), cellPlan)
  }
}
