package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Diagnostic: per-stage wall time of the corpus-prep composition, run
  * exactly as d_corpus_prep wires it. Each stage is forced with its own
  * action so the cost attribution is unambiguous (the composed query
  * runs the same stages lazily inside one job DAG).
  * Usage: runMain graft.PrepProfile [sfDir]
  */
object PrepProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-prep-profile")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prep] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.where(col("doc_id") >= 20)
    val bench = docs.where(col("doc_id") < 20)

    val filtered = CorpusPipeline.signals(corpus).where(col("quality_score") >= 0.2)
    t("signals+filter") { filtered.count() }
    val keepers = Dedup.exact(filtered).select(col("keep_id").as("doc_id"))
    val unique = filtered.join(keepers, "doc_id").persist()
    t("exact-dedup unique") { unique.count() }
    val pairs = t("minhashLsh pairs") {
      val p = Dedup.minhashLsh(unique, 3, 64, 16, 0.5, 0); p.count(); p
    }
    val deduped = t("transitive resolution") {
      val d = Dedup.applyDedupTransitive(unique, pairs).persist(); d.count(); d
    }
    t("contamination") {
      Dedup.contamination(deduped, bench, 3, 3).select(col("doc_id")).distinct().count()
    }
    t("full composed prepare()") {
      val r = CorpusPipeline.prepare(corpus, Some(bench),
        CorpusPipeline.Config(minQuality = 0.2))
      r.corpus.write.format("noop").mode("overwrite").save()
      r.release()
    }
    t("full prepare() 2nd run") {
      val r = CorpusPipeline.prepare(corpus, Some(bench),
        CorpusPipeline.Config(minQuality = 0.2))
      r.corpus.write.format("noop").mode("overwrite").save()
      r.release()
    }
    spark.stop()
  }
}

/** Composed-entry-only timing: the exact d_corpus_prep and
  * d_prep_attrition driver shapes, interleaved min-of-N with cache
  * hygiene between runs (the Bench convention) — for before/after
  * comparison of pipeline rewires without the per-stage probes above
  * polluting the cache. Usage: runMain graft.PrepBench [sfDir] [iters]
  */
object PrepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Graft.session(appName = "graft-prep-bench")
    spark.range(1 << 20).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    if (args.contains("--break")) {
      // cost attribution: eager pipeline construction (the component
      // checkpoint job) vs the final write vs the attrition counts
      val docs = Tables.documents(spark, sfDir)
      val (corpus, bench) =
        (docs.where(col("doc_id") >= 20), docs.where(col("doc_id") < 20))
      val cfg = operators.CorpusPipeline.Config(minQuality = 0.2)
      for (pass <- 1 to iters) {
        def t[A](name: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"[break $pass] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
        }
        t("fused scan alone (no pin)") {
          operators.CorpusPipeline.fusedScan(corpus, cfg)
            .write.format("noop").mode("overwrite").save()
        }
        val r = t("prepare() eager build") {
          operators.CorpusPipeline.prepare(corpus, Some(bench), cfg)
        }
        t("corpus noop write") {
          r.corpus.write.format("noop").mode("overwrite").save()
        }
        t("stage counts x5") { r.stages.foreach { case (_, df) => df.count() } }
        r.release()
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    val entries = Seq("d_corpus_prep", "d_prep_attrition")
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to iters; name <- entries) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      samples(name) = t :: samples.getOrElse(name, Nil)
    }
    entries.foreach { n =>
      println(f"[prepbench] $n%-18s min ${samples(n).min}%6.2fs  all ${samples(n).reverse.map(x => f"$x%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}

/** Floor probe: what do a bare corpus scan, the signal scan, and the
  * fused scan cost alone? (attribution for PLANS.md — how much of the
  * prep entries is irreducible scan + scheduling at bench SF) */
object PrepFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-prep-floor")
    spark.range(1 << 20).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[floor] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.where(col("doc_id") >= 20)
    val cfg = operators.CorpusPipeline.Config(minQuality = 0.2)
    for (_ <- 1 to 3) {
      t("bare scan") { corpus.write.format("noop").mode("overwrite").save() }
      t("signals scan") { operators.CorpusPipeline.signals(corpus).write.format("noop").mode("overwrite").save() }
      t("fused scan (sign all)") { operators.CorpusPipeline.fusedScan(corpus, cfg).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
