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
