package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Catalog

/** The term-bucketed text index: same results as the dir-layout index,
  * plus the two plan properties that ARE the point — literal queries
  * bucket-prune the postings scan, and a term-keyed probe join never
  * reshuffles the postings side. */
class BucketedTextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val query = Seq("data", "join", "scan")

  private def freshCat() = new Catalog(spark, sfDir,
    Some(java.nio.file.Files.createTempDirectory("graft-btidx").toString))

  private def hits(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("bucketed indexed search equals the direct scan; upsert folds losslessly") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndexBucketed("bt1", docs.where(col("doc_id") % 3 =!= 0),
      nBuckets = 8)
    cat.upsertTextIndexBucketed("bt1", docs.where(col("doc_id") % 3 === 0), 1L)
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt1"), query)) ==
      hits(TextAnalysis.bm25(docs, query)))
    // retry of a committed batch id: no-op
    cat.upsertTextIndexBucketed("bt1", docs.where(col("doc_id") % 3 === 0), 1L)
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt1"), query)) ==
      hits(TextAnalysis.bm25(docs, query)))
  }

  test("a literal query PRUNES the postings scan to <= |terms| buckets") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndexBucketed("bt2", docs, nBuckets = 16)
    val pruned = cat.loadTextIndexBucketed("bt2").postings
      .where(col("term").isin(query: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of 16".r.findFirstMatchIn(plan)
    assert(m.nonEmpty, s"no bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt <= query.size, plan)
  }

  test("a term-keyed probe join has NO Exchange on the postings side") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndexBucketed("bt3", docs, nBuckets = 8)
    val terms = query.toDF("term")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = cat.loadTextIndexBucketed("bt3").postings
        .join(terms, "term")
      val plan = joined.queryExecution.executedPlan.toString
      // exactly ONE shuffle: the tiny term relation moves to the
      // postings' bucketing; the postings scan itself never exchanges
      val exchanges = plan.linesIterator
        .count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1, s"expected 1 exchange (terms side only):\n$plan")
      val scanLine = plan.linesIterator
        .find(l => l.contains("FileScan") && l.contains("graft_tidx_bt3"))
      assert(scanLine.nonEmpty, plan)
      assert(plan.contains("SelectedBucketsCount") ||
        plan.contains("Bucketed: true"), plan)
    }
  }

  test("asOf serves the index as of a batch; compaction folds and keeps results") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    val base = docs.where(col("doc_id") % 3 === 1)
    cat.buildTextIndexBucketed("bt4", base, nBuckets = 8)
    cat.upsertTextIndexBucketed("bt4", docs.where(col("doc_id") % 3 === 2), 1L)
    cat.upsertTextIndexBucketed("bt4", docs.where(col("doc_id") % 3 === 0), 2L)
    assert(hits(TextAnalysis.bm25Indexed(
        cat.loadTextIndexBucketed("bt4", asOf = Some(0L)), query)) ==
      hits(TextAnalysis.bm25(base, query)))
    val before = hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt4"), query))
    cat.compactTextIndexBucketed("bt4")
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt4"), query)) ==
      before)
    // replay of the highest folded batch no-ops (tombstone table)
    cat.upsertTextIndexBucketed("bt4", docs.where(col("doc_id") % 3 === 0), 2L)
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt4"), query)) ==
      before)
    // the folded stats equal the whole-corpus aggregates
    val st = cat.loadTextIndexBucketed("bt4").stats.collect().head
    assert(st.getLong(0) == docs.count())
  }

  test("a torn compaction (committed intent) heals on the next touch") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndexBucketed("bt5", docs.where(col("doc_id") % 2 === 0),
      nBuckets = 8)
    cat.upsertTextIndexBucketed("bt5", docs.where(col("doc_id") % 2 =!= 0), 1L)
    val expected = hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt5"), query))
    cat.compactTextIndexBucketed("bt5")
    // simulate the crash window: re-write the intent as if the dir
    // swap committed but the metastore half never ran — the next read
    // must replay it idempotently (drops are IF EXISTS, rename guarded)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      s"${cat.derivedDir}/bt5/_compact_intent"), "1\n1")
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt5"), query)) ==
      expected)
    assert(!new java.io.File(s"${cat.derivedDir}/bt5/_compact_intent").exists())
  }

  test("rebuild under an existing name drops stale bucketed segments") {
    val docs = Tables.documents(spark, sfDir)
    val cat = freshCat()
    cat.buildTextIndexBucketed("bt6", docs.where(col("doc_id") % 3 =!= 0),
      nBuckets = 8)
    cat.upsertTextIndexBucketed("bt6", docs.where(col("doc_id") % 3 === 0), 1L)
    cat.buildTextIndexBucketed("bt6", docs, nBuckets = 8)
    val st = cat.loadTextIndexBucketed("bt6").stats.collect().head
    assert(st.getLong(0) == docs.count())
    assert(hits(TextAnalysis.bm25Indexed(cat.loadTextIndexBucketed("bt6"), query)) ==
      hits(TextAnalysis.bm25(docs, query)))
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

/** Phrase-scored BM25: adjacency, not co-occurrence — the planted
  * fixture separates "new york" from "york ... new" — and the indexed
  * form equals the scan. */
class PhraseBm25Spec extends SparkSpec {
  import spark.implicits._

  test("adjacent phrase matches; scattered co-occurrence does not") {
    val docs = Seq(
      (1L, "visited new york last fall"),      // adjacent → match
      (2L, "york was new to me entirely"),     // scattered → no match
      (3L, "new york new york twice over"),    // two starts → tf = 2
      (4L, "completely unrelated text here"),
      (5L, "york new reversed order stays out") // reversed → no match
    ).toDF("doc_id", "text")
    val res = graft.operators.TextAnalysis
      .bm25Phrase(docs, Seq("new", "york"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(res == Set(1L, 3L))
  }

  test("repeated-start tf counts every phrase start") {
    val docs = Seq(
      (1L, "a b a b a b"), // "a b" starts at 0, 2, 4 → tf 3
      (2L, "a a b b a")    // starts at 1 only → tf 1
    ).toDF("doc_id", "text")
    val scores = graft.operators.TextAnalysis
      .bm25Phrase(docs, Seq("a", "b"), k = 10).collect()
    // both match; doc 1's higher tf must outscore doc 2 (same dl? no —
    // dl differs; just assert both present and doc1 first)
    assert(scores.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(scores.head.getLong(0) == 1L)
  }

  test("three-term phrases require full adjacency") {
    val docs = Seq(
      (1L, "big data join scan pipeline"),
      (2L, "data quick join fast scan")
    ).toDF("doc_id", "text")
    val res = graft.operators.TextAnalysis
      .bm25Phrase(docs, Seq("data", "join", "scan"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(res == Set(1L))
  }

  test("indexed phrase search equals the direct scan on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
    val cat = new Catalog(spark, sfDir,
      Some(java.nio.file.Files.createTempDirectory("graft-phrase").toString))
    cat.buildTextIndex("pt", docs, positional = true)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hits(graft.operators.TextAnalysis.bm25PhraseIndexed(
        cat.loadTextIndex("pt"), Seq("data", "join"))) ==
      hits(graft.operators.TextAnalysis.bm25Phrase(docs, Seq("data", "join"))))
    // a non-positional index refuses the phrase read loudly
    cat.buildTextIndex("pt_plain", docs)
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.bm25PhraseIndexed(
        cat.loadTextIndex("pt_plain"), Seq("data", "join"))
    }
  }
}

/** Auto-maintain inside the streaming drive: segment count stays
  * bounded THROUGHOUT the replay, results unchanged, exactly-once
  * markers surviving the folds. */
class AutoMaintainSpec extends SparkSpec {
  import spark.implicits._

  test("live index replay keeps committed segments <= threshold throughout") {
    import graft.sources.Catalog
    import graft.streaming.Replay
    val threshold = 3
    val cat = new Catalog(spark, sfDir,
      Some(java.nio.file.Files.createTempDirectory("graft-automnt").toString))
    val docs = Tables.documents(spark, sfDir)
    cat.dropDerived("am")
    cat.buildTextIndex("am", docs.limit(0))
    val (dir, schema) = Replay.docSource(spark, sfDir)
    var maxSeen = 0
    def committedSegs(): Int = {
      val root = new java.io.File(s"${cat.derivedDir}/am")
      root.listFiles().count(f => f.isDirectory &&
        f.getName.startsWith("postings_seg_b") &&
        new java.io.File(f, "_SUCCESS").exists())
    }
    Replay.runForeachBatchFrom(spark, dir, schema, maxFilesPerTrigger = 1) {
      (batch, id) =>
        cat.upsertTextIndex("am", batch, id)
        cat.maintainOne("am", threshold): Unit
        maxSeen = math.max(maxSeen, committedSegs())
    }
    assert(maxSeen <= threshold, s"segments peaked at $maxSeen > $threshold")
    assert(committedSegs() <= threshold)
    // the served search equals the direct corpus scan after the folds
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hits(graft.operators.TextAnalysis.bm25Indexed(
        cat.loadTextIndex("am"), Seq("data", "join", "scan"))) ==
      hits(graft.operators.TextAnalysis.bm25(docs, Seq("data", "join", "scan"))))
    // exactly-once survives the fold: a replay of the HIGHEST applied
    // batch id is still a no-op (its tombstone rode the compaction)
    val before = hits(graft.operators.TextAnalysis.bm25Indexed(
      cat.loadTextIndex("am"), Seq("data", "join", "scan")))
    val root = new java.io.File(s"${cat.derivedDir}/am")
    val maxId = root.listFiles().filter(_.getName.startsWith("postings_seg_b"))
      .map(_.getName.stripPrefix("postings_seg_b").toLong).max
    cat.upsertTextIndex("am", docs.limit(5), maxId)
    assert(hits(graft.operators.TextAnalysis.bm25Indexed(
        cat.loadTextIndex("am"), Seq("data", "join", "scan"))) == before)
  }
}

/** The decile-shift drift card: split-invariant (lossless sketch fold)
  * and exact on a planted shift. */
class DecileShiftSpec extends SparkSpec {
  import spark.implicits._

  test("card off incrementally folded state equals the one-shot sketch") {
    import graft.operators.TextAnalysis
    import graft.sources.Catalog
    val ev = Tables.events(spark, sfDir).select(
      org.apache.spark.sql.functions.pmod(col("user_id"),
        org.apache.spark.sql.functions.lit(2L)).as("cohort"),
      TextAnalysis.portableHash60(col("event_id")).as("h"),
      col("value").as("val"), col("event_id"))
    val cat = new Catalog(spark, sfDir,
      Some(java.nio.file.Files.createTempDirectory("graft-dshift").toString))
    (0 until 3).foreach { b =>
      cat.refreshQsketchMv("inc", ev.where(pmod(col("event_id"), lit(3)) === b),
        Seq("cohort"), "h", "val", 256)
    }
    cat.refreshQsketchMv("one", ev, Seq("cohort"), "h", "val", 256)
    def card(name: String) = TextAnalysis
      .decileShiftCard(cat.mvState(name), "cohort")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(card("inc") == card("one"))
  }

  test("a planted location shift is detected; identical cohorts read ~0") {
    import graft.operators.TextAnalysis
    val same = (1 to 400).flatMap(i =>
      Seq((0L, i.toLong, i.toDouble % 97), (1L, i.toLong + 1000L, i.toDouble % 97)))
      .toDF("cohort", "h", "val")
    val sameKs = TextAnalysis.decileShiftCard(same, "cohort")
      .select("ks").distinct().as[Double].head()
    assert(sameKs < 0.01, s"identical cohorts ks=$sameKs")
    val shifted = (1 to 400).flatMap(i =>
      Seq((0L, i.toLong, (i % 100).toDouble),
        (1L, i.toLong + 1000L, (i % 100).toDouble + 50.0)))
      .toDF("cohort", "h", "val")
    val ks = TextAnalysis.decileShiftCard(shifted, "cohort")
      .select("ks").distinct().as[Double].head()
    assert(ks > 0.4, s"planted +50 shift ks=$ks")
  }
}
