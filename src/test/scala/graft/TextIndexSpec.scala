package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Catalog

/** The durable inverted text index: indexed search equals the direct
  * scan, upserted equals monolithic (stats fold losslessly), the
  * segment conventions (retry no-op, torn segment invisible, asOf,
  * compaction) hold exactly as in the ANN family. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val query = Seq("data", "join", "scan")

  private def freshCat() = new Catalog(spark, sfDir,
    Some(java.nio.file.Files.createTempDirectory("graft-tidx").toString))

  private def hits(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("indexed search equals the direct scan exactly") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndex("ti", docs)
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) ==
      hits(TextAnalysis.bm25(docs, query)))
  }

  test("upserted index equals the monolithic rebuild (stats fold losslessly)") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndex("ti", docs.where(col("doc_id") % 3 =!= 0))
    cat.upsertTextIndex("ti", docs.where(col("doc_id") % 3 === 0), 1L)
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) ==
      hits(TextAnalysis.bm25(docs, query)))
    // folded stats equal the whole-corpus aggregates
    val st = cat.loadTextIndex("ti").stats.collect().head
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))))
    assert(st.getLong(0) == docs.count() && st.getLong(1) == toks.count())
  }

  test("retry of a committed batch id is a no-op; torn segment never serves") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndex("ti", docs.where(col("doc_id") % 3 =!= 0))
    cat.upsertTextIndex("ti", docs.where(col("doc_id") % 3 === 0), 1L)
    val before = hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query))
    cat.upsertTextIndex("ti", docs.where(col("doc_id") % 3 === 0), 1L) // retry
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) == before)
    // torn: a postings segment without _SUCCESS is invisible, as are
    // its earlier-written dl/stats siblings
    val root = new java.io.File(s"${cat.derivedDir}/ti")
    new java.io.File(root, "postings_seg_b2").mkdirs()
    new java.io.File(root, "dl_seg_b2").mkdirs()
    new java.io.File(root, "stats_seg_b2").mkdirs()
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) == before)
  }

  test("asOf reads the index as it stood after a batch") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    val base = docs.where(col("doc_id") % 3 =!= 0)
    cat.buildTextIndex("ti", base)
    cat.upsertTextIndex("ti", docs.where(col("doc_id") % 3 === 0), 1L)
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti", asOf = Some(0L)), query)) ==
      hits(TextAnalysis.bm25(base, query)))
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti", asOf = Some(1L)), query)) ==
      hits(TextAnalysis.bm25(docs, query)))
  }

  test("compaction folds segments, keeps results, survives a retried batch") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndex("ti", docs.where(col("doc_id") % 3 === 1))
    cat.upsertTextIndex("ti", docs.where(col("doc_id") % 3 === 2), 1L)
    cat.upsertTextIndex("ti", docs.where(col("doc_id") % 3 === 0), 2L)
    val before = hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query))
    cat.compactTextIndex("ti")
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) == before)
    // the tombstone keeps the highest applied batch visible: a replayed
    // batch 2 must no-op, not double-count df/dl
    cat.upsertTextIndex("ti", docs.where(col("doc_id") % 3 === 0), 2L)
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) == before)
    // idempotent re-compaction
    cat.compactTextIndex("ti")
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) == before)
  }

  test("streamed index maintenance equals the direct scan at any batching") {
    val direct = hits(TextAnalysis.bm25(Tables.documents(spark, sfDir), query))
    val one = hits(graft.streaming.DocStream
      .textIndexMaintenanceReplay(spark, sfDir, maxFilesPerTrigger = 1))
    val six = hits(graft.streaming.DocStream
      .textIndexMaintenanceReplay(spark, sfDir, maxFilesPerTrigger = 6))
    assert(one == direct, s"stream(1) $one vs direct $direct")
    assert(six == direct, s"stream(6) $six vs direct $direct")
  }

  test("maintain compacts only artifacts at or past the segment threshold") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    // text index with 3 committed segments; SCD2 with 1 — threshold 3
    // folds the first and leaves the second's layout untouched
    cat.buildTextIndex("ti", docs.where(col("doc_id") % 4 === 0))
    (1 to 3).foreach(i =>
      cat.upsertTextIndex("ti", docs.where(col("doc_id") % 4 === i), i.toLong))
    import spark.implicits._
    cat.refreshScd2Mv("h", Seq((1L, 10L, "u", "a"), (1L, 20L, "u", "b"))
      .toDF("k", "seq", "op", "v"), "k", "seq", "op", 0L)
    val before = hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query))
    assert(cat.maintain(threshold = 3) == Seq("ti"))
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndex("ti"), query)) == before)
    def segs(name: String, p: String) =
      new java.io.File(s"${cat.derivedDir}/$name").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith(p))
    assert(segs("ti", "postings_seg_b") == 1) // the tombstone only
    assert(segs("h", "closed_seg_b") == 1)    // untouched
    assert(cat.maintain(threshold = 3).isEmpty) // idempotent at rest
  }

  test("missing index is refused with a clear message") {
    val cat = freshCat()
    val e = intercept[IllegalArgumentException] { cat.loadTextIndex("nope") }
    assert(e.getMessage.contains("no committed text index"))
    val e2 = intercept[IllegalArgumentException] {
      cat.upsertTextIndex("nope", Tables.documents(spark, sfDir), 1L)
    }
    assert(e2.getMessage.contains("no committed text index"))
  }

  test("query-term read prunes the postings scan (pushed filter on term)") {
    val cat = freshCat()
    cat.buildTextIndex("ti", Tables.documents(spark, sfDir))
    val plan = cat.loadTextIndex("ti").postings
      .where(col("term").isin(query: _*)).opPlanString
    assert(plan.contains("PushedFilters: [In(term"), plan)
  }
}
