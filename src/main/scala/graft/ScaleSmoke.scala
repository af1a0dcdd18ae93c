package graft

import org.apache.spark.sql.functions._

/** Diagnostic: replicate the sf0.1 corpus 20× (documents) / 10× (events)
  * into /tmp and time the heavy operators — an empirical check that
  * their cost curves stay near-linear when the input grows, i.e. that no
  * hidden quadratic or skew blow-up is waiting past the bench SF.
  * Usage: runMain graft.ScaleSmoke
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    // optional args: entry-name substrings — run only matching entries
    // (fast local iteration on one operator's scale curve)
    val only: Option[Seq[String]] = if (args.nonEmpty) Some(args.toSeq) else None
    def selected(name: String): Boolean = only.forall(_.exists(name.contains))
    val spark = Graft.session(appName = "graft-scale-smoke")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (0 until 20).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet("/tmp/graft_bigdocs.parquet")
    val events = Tables.events(spark, "/root/testdata/sf0.1")
    (0 until 10).map(i => events.withColumn("user_id", col("user_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet("/tmp/graft_bigevents.parquet")

    val bd = spark.read.parquet("/tmp/graft_bigdocs.parquet")
    val be = spark.read.parquet("/tmp/graft_bigevents.parquet")
    def time(name: String)(f: => Unit): Unit = if (selected(name)) {
      val t0 = System.nanoTime(); f
      println(f"[scale] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      // cache hygiene BETWEEN entries (outside the timed region): some
      // operators persist intermediates (centroid tables, pipeline
      // pins); left pinned across 25 entries they squeeze later
      // entries' shuffle memory and skew the attribution — the same
      // lesson Bench.scala learned in round 2. Full-run numbers on this
      // machine remain noisy regardless (multi-minute stall phases hit
      // arbitrary entries, different ones each run); treat fresh-JVM
      // SmokeOne minima as the real figures.
      spark.catalog.clearCache()
    }
    println(s"[scale] docs=${bd.count()} events=${be.count()}")
    // raw minhash on a corpus that is 95% exact duplicates is the LSH
    // worst case (quadratic inside dup-cluster buckets) — the realistic
    // ladder collapses exact dups first, then near-dups the keepers;
    // the bucket cap is the safety valve for clusters that survive
    time("minhash_capped") {
      operators.Dedup.minhashLsh(bd, 3, 64, 16, 0.5, maxBucket = 100)
        .write.format("noop").mode("overwrite").save()
    }
    time("exact_then_minhash") {
      val keepers = operators.Dedup.exact(bd).select(col("keep_id").as("doc_id"))
      operators.Dedup.minhashLsh(bd.join(keepers, "doc_id"), 3, 64, 16, 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    time("boilerplate_100k") {
      operators.Dedup.boilerplate(bd, 3, 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("exact_100k") {
      operators.Dedup.exact(bd).write.format("noop").mode("overwrite").save()
    }
    time("simhash_100k") {
      operators.Dedup.simhashNearDup(bd, 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("sessionize_1m") {
      operators.Events.sessionize(be).write.format("noop").mode("overwrite").save()
    }
    time("wordcount_100k") {
      operators.MapReduceOps.wordCount(bd)
        .write.format("noop").mode("overwrite").save()
    }
    // prefix-sum packing: must scale with the corpus scan (the only
    // unpartitioned window is the 128-row bucket-offset table)
    time("pack_1m_docs") {
      operators.Sampling.packSequences(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("repetition_100k") {
      operators.TextAnalysis.repetition(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("redact_1m_events") {
      operators.TextAnalysis.redact(be, "event_id", "props")
        .write.format("noop").mode("overwrite").save()
    }
    time("kmv_6m_rows") {
      // replicate like the other smokes — same-size input can't reveal
      // super-linear growth (keys shifted so distinct counts scale too)
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      val big = (0 until 10).map(i =>
          li.withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L))
            .withColumn("l_suppkey", col("l_suppkey") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
      operators.Analytics.kmvSummary(big)
        .write.format("noop").mode("overwrite").save()
    }
    // dup-chain resolution over ~95k star-shaped clone pairs (the shape
    // exact dedup emits) — BOTH ladder rungs: the driver union-find
    // (default route at this size) and the distributed hash-to-min loop
    // (forced, the 100 TB path — label propagation converges in ~2
    // rounds on stars)
    def clonePairs = {
      val groups = operators.Dedup.exact(bd)
      bd.select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("h"))
        .join(groups.where(col("n_copies") > 1), "h")
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("keep_id").as("id_a"), col("doc_id").as("id_b"))
    }
    time("components_95k_local") {
      operators.Dedup.connectedComponents(clonePairs)
        .write.format("noop").mode("overwrite").save()
    }
    time("components_95k_dist") {
      operators.Dedup.connectedComponents(clonePairs, localMaxPairs = 0)
        .write.format("noop").mode("overwrite").save()
    }
    time("span_dedup_100k") {
      operators.Dedup.spanDedup(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("lm_score_100k") {
      operators.TextAnalysis.lmScore(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("funnel_1m_events") {
      operators.Events.funnel(be)
        .write.format("noop").mode("overwrite").save()
    }
    // 1M points × 7k intervals as the NAIVE theta join: without the
    // RangeJoinRewrite rule this is a 7-billion-comparison nested loop
    // (not runnable here); with the rule it's a binned equi-join that
    // finishes with the scan-bound operators above
    time("range_join_auto_1m") {
      operators.Events.maintenanceWindowCountsAuto(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("signatures_100k") {
      operators.Dedup.buildMinhashIndex(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("containment_100k") {
      // quadratic verifier by design — run on the exact-dedup keepers
      // (the documented ladder), not the 95%-clone corpus
      val keepers = operators.Dedup.exact(bd).select(col("keep_id").as("doc_id"))
      operators.Dedup.containmentPairs(bd.join(keepers, "doc_id"), 3, 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    time("anomaly_1m_events") {
      operators.Events.anomalies(be)
        .write.format("noop").mode("overwrite").save()
    }
    // the full fused prep at 20× docs: here the map work (tokenize +
    // 64-hash signing) dominates scheduling, so the one-scan fusion is
    // measurable — and the 95%-clone corpus exercises the broadcast
    // anti-join dedup + capped LSH at their intended scale shape
    time("corpus_prep_100k") {
      val r = operators.CorpusPipeline.prepare(bd,
        cfg = operators.CorpusPipeline.Config(minQuality = 0.2, maxBucket = 100))
      r.corpus.write.format("noop").mode("overwrite").save()
      r.release()
    }

    // ANN ladder at 50× the bench vector count (100k vectors): brute
    // force scans the whole corpus per query; LSH/IVF touch one bucket /
    // nProbe cells — the gap is the scale argument
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    (0 until 50).map(i => emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet("/tmp/graft_bigemb.parquet")
    val bigEmb = spark.read.parquet("/tmp/graft_bigemb.parquet")
    println(s"[scale] vectors=${bigEmb.count()}")
    time("ann_brute_100k") {
      operators.Similarity.bruteForceTopK(bigEmb, 5, 10)
        .write.format("noop").mode("overwrite").save()
    }
    time("ann_lsh_100k") {
      operators.Similarity.lshAnn(bigEmb, 5, 10, nPlanes = 8)
        .write.format("noop").mode("overwrite").save()
    }
    time("ann_ivf_100k") {
      operators.Similarity.ivfAnn(bigEmb, 5, 10, nCells = 64, nProbe = 4)
        .write.format("noop").mode("overwrite").save()
    }
    // the index split: build once (includes one k-means pass), then
    // probe-only search — the amortized shape a query service runs
    locally {
      val t0 = System.nanoTime()
      val index = operators.Similarity.buildIvfIndex(bigEmb, nCells = 64)
      index.assignments.write.mode("overwrite").parquet("/tmp/graft_ivf_idx.parquet")
      index.centroids.write.mode("overwrite").parquet("/tmp/graft_ivf_cents.parquet")
      println(f"[scale] ivf_build_100k     ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      val persisted = operators.Similarity.IvfIndex(
        spark.read.parquet("/tmp/graft_ivf_idx.parquet"),
        spark.read.parquet("/tmp/graft_ivf_cents.parquet"))
      val queries = persisted.assignments.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      time("ivf_search_100k") {
        operators.Similarity.ivfSearch(persisted, queries, 10, nProbe = 4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // cell-bounded semantic dedup at 100k vectors (the SemDeDup scale path)
    time("semantic_100k") {
      operators.Similarity.semanticDedup(bigEmb, 0.4, nCells = 64)
        .write.format("noop").mode("overwrite").save()
    }
    // BPE fitting cost is dominated by the ONE corpus scan that builds
    // the word-frequency table; the 8 merge rounds then run over the
    // distinct vocabulary alone, so 20× the corpus should cost ~20× the
    // scan and ~0× the rounds (same vocab)
    time("bpe_train_100k") {
      operators.Bpe.merges(bd, 8).write.format("noop").mode("overwrite").save()
    }
    time("importance_100k") {
      operators.TextAnalysis.importanceWeights(bd, col("lang") === "en")
        .write.format("noop").mode("overwrite").save()
    }
    // round-5 operators: all designed as scan + bounded-metadata
    // broadcast-back, so each should track the corpus scan linearly
    time("gopher_rules_100k") {
      operators.TextAnalysis.gopherRules(bd,
          stops = operators.TextAnalysis.EnStopwords)
        .write.format("noop").mode("overwrite").save()
    }
    time("ccnet_buckets_100k") {
      operators.TextAnalysis.ccnetBuckets(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("classify_100k") {
      operators.Similarity.centroidClassify(bigEmb.withColumn("label",
          pmod(col("vec_id"), lit(10)).cast("int")))
        .write.format("noop").mode("overwrite").save()
    }
    time("kmeans_100k") {
      operators.Similarity.kmeansCentroids(bigEmb, nCells = 64, refinePasses = 2)
        .write.format("noop").mode("overwrite").save()
    }
    // round 6: the new event/text/graph families at 10× events / 20× docs
    time("ewma_1m_events") {
      operators.Events.ewmaDecayedSum(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("gap_fill_1m") {
      operators.Events.gapFillForward(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("char_ngrams_100k") {
      operators.TextAnalysis.charNgramTop(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("sentences_100k") {
      operators.TextAnalysis.sentenceStats(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("pagerank_sf01") {
      // edges from the full sf0.1 fact tables; iterations on the
      // nation-grain graph are scale-invariant once edges aggregate
      operators.Graph.nationPagerank(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
    }
    // round 6b: robust stats, lateness audit, pair mining at 10× facts
    time("mad_1m_events") {
      operators.Events.madOutliers(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("late_audit_1m") {
      operators.Events.latenessAudit(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("keyword_topk_100k") {
      operators.TextAnalysis.keywordTopK(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("basket_pairs_6m") {
      // keys shifted per replica so basket sizes stay constant while
      // order count 10×es — fan-out must scale with orders, not pairs²
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      val big = (0 until 10).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionAll _)
      operators.Analytics.basketPairs(big)
        .write.format("noop").mode("overwrite").save()
    }
    time("gini_1m_orders") {
      // 10× orders under 10× customers: the two-level rank scan must
      // stay bucket-parallel as per-nation customer counts grow
      val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val bigSpend = (0 until 10).map(i =>
          ord.withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
        .withColumn("n_name", concat(lit("N"), pmod(col("o_custkey"), lit(25))))
        .select(col("n_name"), col("x"))
      operators.Analytics.giniByGroup(bigSpend)
        .write.format("noop").mode("overwrite").save()
    }
    // round 7: the graph family's DISTRIBUTED rungs — the driver queries
    // only ever price the nation-grain broadcast/driver paths, so this
    // is where the 100 TB story gets measured: a synthetic 100k-node /
    // ~1.2M-edge graph (12 hash-random out-edges per node, weights
    // 1..1000) through pagerank with coalesceTo = None (the
    // default-parallelism rung, no single-partition pin) and
    // shortestPaths past localMaxEdges (the synchronous-relaxation rung
    // instead of the driver BFS)
    locally {
      val n = 100000L
      val fan = 12L
      spark.range(n * fan).select(
          concat(lit("v"), expr(s"id div $fan")).as("src"),
          concat(lit("v"), pmod(xxhash64(col("id")), lit(n))).as("dst"),
          (pmod(xxhash64(col("id"), lit(1L)), lit(1000L)) + 1L).as("w"))
        .where(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
        .write.mode("overwrite").parquet("/tmp/graft_bigedges.parquet")
      val bedges = spark.read.parquet("/tmp/graft_bigedges.parquet")
      val bnodes = spark.range(n).select(concat(lit("v"), col("id")).as("node"))
        .localCheckpoint()
      println(s"[scale] graph nodes=$n edges=${bedges.count()}")
      time("pagerank_1m_dist") {
        operators.Graph.pagerank(bedges, bnodes, iters = 3, coalesceTo = None)
          .write.format("noop").mode("overwrite").save()
      }
      time("bfs_1m_dist") {
        // fanout 3 over 100k nodes → ~300k sparsified edges, far past
        // localMaxEdges: forces the distributed relaxation rung
        val source = bnodes.agg(min(col("node")).as("__src"))
        operators.Graph.shortestPaths(bedges, bnodes, source,
            fanout = 3, maxHops = 8)
          .write.format("noop").mode("overwrite").save()
      }
      time("triangles_1m") {
        operators.Graph.triangleCensus(bedges)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // round 7b: distribution cards and detection ops — all value-grain
    // two-level scans or minute-grain windows, so each should track its
    // input scan linearly
    locally {
      val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val bigOrd = (0 until 10).map(i =>
          ord.withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
        .reduce(_ unionAll _)
      time("lorenz_1m_orders") {
        operators.Analytics.lorenzDeciles(bigOrd)
          .write.format("noop").mode("overwrite").save()
      }
      time("rfm_1m_orders") {
        operators.Analytics.rfmSegments(bigOrd)
          .write.format("noop").mode("overwrite").save()
      }
      time("benford_1m_orders") {
        operators.Analytics.benfordCard(bigOrd)
          .write.format("noop").mode("overwrite").save()
      }
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      val bigLi = (0 until 10).map(i =>
          li.withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L))
            .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionAll _)
      time("abc_6m_lines") {
        operators.Analytics.abcClassification(bigLi)
          .write.format("noop").mode("overwrite").save()
      }
      time("basket_rules_6m") {
        operators.Analytics.basketRules(bigLi)
          .write.format("noop").mode("overwrite").save()
      }
      time("tukey_1m_orders") {
        // synthetic nation spread over the shifted keys so quartile
        // groups scale with customers
        val spend = bigOrd.groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
          .withColumn("n_name", concat(lit("N"), pmod(col("o_custkey"), lit(25))))
          .select(col("n_name"), col("x"))
        val quarts = spend.groupBy(col("n_name"))
          .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY x)")
            .cast("long").as("q1"),
            expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY x)")
              .cast("long").as("q3"))
        spend.join(broadcast(quarts), "n_name")
          .groupBy(col("n_name"))
          .agg(sum(when(col("x") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3, 1L)
            .otherwise(0L)).as("n_low"))
          .write.format("noop").mode("overwrite").save()
      }
      time("contract_1m_orders") {
        graft.sources.Catalog.contractCard(bigOrd,
          predicates = Seq(
            "totalprice_positive" -> (col("o_totalprice") > 0),
            "orderdate_not_null" -> col("o_orderdate").isNotNull),
          uniqueKeys = Seq("orderkey_unique" -> "o_orderkey"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("cusum_1m_events") {
      operators.Events.cusumChangePoint(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("match_1m_events") {
      operators.Events.matchEpisodes(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("deseason_1m_events") {
      // the top-k-without-a-corpus-window claim priced at 1M rows
      operators.Events.deseasonOutliers(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("funnel4_1m_events") {
      operators.Events.funnelRates(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("runs_1m_events") {
      operators.Events.runsTest(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("datasheet_100k_docs") {
      operators.TextAnalysis.datasheet(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("source_overlap_100k") {
      operators.TextAnalysis.sourceOverlap(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("peaks_1m_events") {
      operators.Events.peakCensus(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("radius_100k") {
      operators.Similarity.radiusSearch(
          spark.read.parquet("/tmp/graft_bigemb.parquet"), 5, 0.3)
        .write.format("noop").mode("overwrite").save()
    }
    // the silhouette scale rung: exact silhouette is O(n²) (1e10 pairs
    // here — unrunnable); the centroid form is two linear scans + a
    // labels×dim aggregation, so 50× the vectors costs ~50× the scan
    time("sil_centroid_100k") {
      operators.Similarity.silhouetteCentroid(
          spark.read.parquet("/tmp/graft_bigemb.parquet"))
        .write.format("noop").mode("overwrite").save()
    }
    // round 7b fourth wave: behavioral cards at 10× facts
    time("growth_1m_events") {
      operators.Events.growthAccounting(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("stickiness_1m") {
      operators.Events.stickiness(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("backtest_1m") {
      operators.Events.forecastBacktest(be)
        .write.format("noop").mode("overwrite").save()
    }
    locally {
      val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val bigOrd = (0 until 10).map(i =>
          ord.withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionAll _)
      time("ltv_1m_orders") {
        operators.Analytics.cohortLtv(bigOrd)
          .write.format("noop").mode("overwrite").save()
      }
      time("new_repeat_1m") {
        operators.Analytics.newVsRepeat(bigOrd)
          .write.format("noop").mode("overwrite").save()
      }
      time("reorder_gap_1m") {
        operators.Analytics.reorderGaps(bigOrd)
          .write.format("noop").mode("overwrite").save()
      }
      time("histogram_1m") {
        graft.sources.Catalog.equiDepthHistogram(bigOrd,
            expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .write.format("noop").mode("overwrite").save()
      }
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      val bigLi2 = (0 until 10).map(i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionAll _)
      time("wmedian_6m_lines") {
        operators.Analytics.weightedMedian(bigLi2)
          .write.format("noop").mode("overwrite").save()
      }
      time("skew_6m_lines") {
        graft.sources.Catalog.skewCard(bigLi2, col("l_orderkey"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("concurrency_1m") {
      operators.Events.peakConcurrency(be)
        .write.format("noop").mode("overwrite").save()
    }
    // round 7c: graph family on a SYNTHETIC 1M-edge graph (100k nodes,
    // ~20 avg undirected degree — the distributed rungs, not the
    // 25-nation broadcast instance), ACF/chi2 at 10× facts, DBSCAN
    // routed through the SemDeDup-celled scale path
    locally {
      val edges = spark.range(1000000).select(
        concat(lit("n"), col("id") % 100000).as("src"),
        concat(lit("n"), pmod(xxhash64(col("id")), lit(100000))).as("dst"),
        (col("id") % 10 + 1).cast("long").as("w"))
        .localCheckpoint()
      time("kcore15_1m_edges") {
        // k=15 against ~20 average degree → a real peel cascade, 8
        // full distributed rounds (no coalesce pin)
        operators.Graph.kCore(edges, k = 15)
          .write.format("noop").mode("overwrite").save()
      }
      time("jaccard_1m_edges") {
        // raw wedge join: Σ_v deg(v)² ≈ 4e7 intermediate rows — the
        // honest cost bound of the pair generator at this density
        operators.Graph.neighborJaccard(edges)
          .write.format("noop").mode("overwrite").save()
      }
      time("cc_1m_edges") {
        // ~20 average degree → giant component, diameter ~log n: the
        // convergence detector should exit in a handful of distributed
        // min-propagation rounds, not a fixed budget
        operators.Graph.connectedComponents(edges)
          .write.format("noop").mode("overwrite").save()
      }
      time("lpa_1m_edges") {
        operators.Graph.labelPropagation(edges, rounds = 4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("acf_1m_events") {
      operators.Events.acf(be)
        .write.format("noop").mode("overwrite").save()
    }
    locally {
      val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val bigOrd = (0 until 10).map(i =>
          ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionAll _)
      time("chi2_1m_orders") {
        operators.Analytics.chiSquareCard(bigOrd)
          .write.format("noop").mode("overwrite").save()
      }
    }
    locally {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val emb20k = (0 until 10).map(i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
      time("dbscan_20k_vecs") {
        // 20k vectors > exactMaxRows → embeddingDedup routes the pair
        // mine through SemDeDup cells; components + border assignment
        // run on the mined pair graph, never the corpus cross product
        operators.Similarity.dbscanEmbeddings(emb20k)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("quality_model_100k") {
      // 3 GD passes + the card pass over 100k docs: cost must stay
      // ~4× one corpus scan (each step is one map-side-combinable
      // aggregate with a 1-row combine — no shuffle to grow)
      operators.QualityModel.trainCard(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("quality_scores_100k") {
      // train + the map-only scorer: inference adds one projection pass
      operators.QualityModel.trainAndScore(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("token_budget_100k") {
      // global best-first cumsum at 100k docs on the two-level scan
      operators.Sampling.tokenBudget(bd, budget = 1000000L)
        .write.format("noop").mode("overwrite").save()
    }
    time("attribution_1m") {
      // one user-partitioned window + 3-row rollup over 1M events
      operators.Events.attributionCard(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("mv_join_1m") {
      // append-only join view at 1M fact rows: two segment appends +
      // compaction — refresh cost must track delta size, not view size
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-jmv").toString
      val cat = new graft.sources.Catalog(spark, root)
      val fact = be.select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_cents"))
      val dim = be.select(col("user_id")).distinct()
        .withColumn("segment", pmod(col("user_id"), lit(10)))
      cat.appendJoinMv("ev1m", fact.where(col("event_id") % 10 =!= 0),
        dim, Seq("user_id"), Some(1L))
      cat.appendJoinMv("ev1m", fact.where(col("event_id") % 10 === 0),
        dim, Seq("user_id"), Some(2L))
      cat.compactJoinMv("ev1m")
        .write.format("noop").mode("overwrite").save()
    }
    time("mwu_1m") {
      // rank test at 1M events: one value-grain aggregate + the
      // two-level prefix scan + a 1-row combine — scan-bound
      operators.Analytics.mannWhitneyU(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("attribution_multi_1m") {
      // user-keyed purchases⋈touches + purchase-partitioned windows at
      // 1M events: join fan-out bounded by one user's lookback window
      operators.Events.multiTouchAttribution(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("allpairs_2k_dist") {
      // the distributed multi-source BFS on a 2000-node synthetic
      // backbone (forced past the driver route): a 3-out-permutation
      // expander (dst = a·id+b mod n, a coprime to n), so the diameter
      // is ~log₃ n ≈ 7 — rounds stay the DIAMETER while settled state
      // grows to all ~4M reachable pairs, the shape the operator must
      // carry at corpus scale
      val n = 2000
      val nodes = spark.range(n).selectExpr("format_string('v%05d', id) AS node")
      val edges = Seq((3L, 1L), (7L, 3L), (11L, 5L)).map { case (a, b) =>
        spark.range(n).selectExpr(
          "format_string('v%05d', id) AS src",
          s"format_string('v%05d', ($a * id + $b) % $n) AS dst",
          s"$a AS w")
      }.reduce(_ unionAll _)
      operators.Graph.allPairsHops(edges, nodes,
          fanout = 3, localMaxEdges = 0L)
        .write.format("noop").mode("overwrite").save()
    }
    // ---- round 10 additions ----
    time("cms_1m") {
      // count-min at 1M events' user ids: d×w counters regardless of
      // input — the whole reduce side is 4×256 rows, scan-bound
      operators.Analytics.cmsFrequency(
          be.select(col("user_id").as("l_partkey")))
        .write.format("noop").mode("overwrite").save()
    }
    time("paths_1m") {
      // path mining at 1M events: user-keyed window + session-grain
      // aggregate + bounded-heap top-k — no global sort anywhere
      operators.Events.topPaths(be)
        .write.format("noop").mode("overwrite").save()
    }
    time("kanon_100k") {
      // class-grain aggregate at 100k docs: shuffle bounded by the QI
      // grid, never row grain past the map-side combine
      operators.TextAnalysis.kAnonymityCard(bd)
        .write.format("noop").mode("overwrite").save()
    }
    time("scd2_1m") {
      // type-2 history over a 1M-row synthetic change log: one
      // key-partitioned lead window at change grain
      val ch = be.select(col("event_id").as("k"), col("user_id").as("v"),
        pmod(col("event_id"), lit(3L)).as("seq"),
        when(pmod(col("event_id"), lit(7L)) === 0L, "d").otherwise("u").as("op"))
      graft.sources.Catalog.scd2History(ch, "k", "seq", "op")
        .write.format("noop").mode("overwrite").save()
    }
    time("kmv_mv_1m") {
      // bounded-sketch MV at 1M events: two arrival-order refreshes,
      // state ≤ k hashes per event type regardless of history
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-kmv").toString
      val cat = new graft.sources.Catalog(spark, root)
      val h = be.select(col("event_type"),
        operators.TextAnalysis.portableHash60(col("user_id")).as("h"),
        col("event_id"))
      cat.refreshKmvMv("u1m", h.where(col("event_id") % 2 === 0),
        Seq("event_type"), "h", 64)
      cat.refreshKmvMv("u1m", h.where(col("event_id") % 2 =!= 0),
        Seq("event_type"), "h", 64)
      cat.kmvMvEstimate("u1m", Seq("event_type"), 64)
        .write.format("noop").mode("overwrite").save()
    }
    time("ann_upsert_40k") {
      // index upsert at 40k vectors (20× bench embeddings): delta
      // assignment is map-only against the frozen broadcast centroids
      val bigv = (0 until 20).map(i => spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-ann").toString
      val cat = new graft.sources.Catalog(spark, root)
      cat.saveAnnIndex("big",
        operators.Similarity.buildIvfIndex(bigv.where(col("vec_id") % 5 =!= 0)))
      cat.upsertAnnIndex("big", bigv.where(col("vec_id") % 5 === 0), 1L)
      val idx = cat.loadAnnIndex("big")
      val qs = idx.assignments.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      operators.Similarity.ivfSearch(idx, qs, 10)
        .write.format("noop").mode("overwrite").save()
    }
    time("ndcg_40k") {
      // both searches stream the 40k corpus once; everything after is
      // query-grain (5 queries × ≤10 rows)
      val bigv = (0 until 20).map(i => spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
      operators.Similarity.ndcgCard(bigv)
        .write.format("noop").mode("overwrite").save()
    }
    time("ann_upsert_q_40k") {
      // quantized build on 80% of 40k + frozen-quantizer delta encode:
      // the delta pass is map-only (centroid literal + broadcast
      // scales), cost O(|delta|·nCells) independent of index size
      val bigv = (0 until 20).map(i => spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-annq").toString
      val cat = new graft.sources.Catalog(spark, root)
      cat.saveAnnIndexQ("bigq",
        operators.Similarity.buildIvfIndexQ(bigv.where(col("vec_id") % 5 =!= 0)))
      cat.upsertAnnIndexQ("bigq", bigv.where(col("vec_id") % 5 === 0), 1L)
      operators.Similarity.ivfSearchQ(cat.loadAnnIndexQ("bigq"),
          operators.Similarity.queryVectors(bigv, 5), 10)
        .write.format("noop").mode("overwrite").save()
    }
    time("scd2_mv_1m") {
      // streaming-SCD2 state fold over a 1M change log in two ordered
      // halves: closed versions append once, only open versions re-
      // enter the window — the second refresh's window is
      // O(open + half), never O(history)
      val ch = be.select(col("user_id").as("k"), col("event_type").as("v"),
        col("event_id").as("seq"),
        when(pmod(col("event_id"), lit(7L)) === 0L, "d").otherwise("u").as("op"))
      val mid = 500000L
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-scd2").toString
      val cat = new graft.sources.Catalog(spark, root)
      cat.refreshScd2Mv("h1m", ch.where(col("seq") < mid), "k", "seq", "op", 0L)
      cat.refreshScd2Mv("h1m", ch.where(col("seq") >= mid), "k", "seq", "op", 1L)
      cat.scd2MvHistory("h1m", "seq", "op")
        .write.format("noop").mode("overwrite").save()
    }
    time("qsketch_mv_1m") {
      // quantile-sketch MV at 1M events: two refreshes, ≤ k (hash,
      // value) pairs per event type ride the shuffle and the state
      val h = be.select(col("event_type"),
        operators.TextAnalysis.portableHash60(col("event_id")).as("h"),
        col("value").as("val"), col("event_id"))
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-qsk").toString
      val cat = new graft.sources.Catalog(spark, root)
      cat.refreshQsketchMv("q1m", h.where(col("event_id") % 2 === 0),
        Seq("event_type"), "h", "val", 256)
      cat.refreshQsketchMv("q1m", h.where(col("event_id") % 2 =!= 0),
        Seq("event_type"), "h", "val", 256)
      cat.qsketchMvEstimate("q1m", Seq("event_type"), 256)
        .write.format("noop").mode("overwrite").save()
    }
    time("drift_1m") {
      // drift card at 1M events: two cohort scans reduced to category
      // grain map-side; everything downstream is category-cardinality
      operators.TextAnalysis.driftCard(
        be.where(pmod(col("user_id"), lit(2L)) === 0),
        be.where(pmod(col("user_id"), lit(2L)) === 1),
        Seq("event_type" -> col("event_type")))
        .write.format("noop").mode("overwrite").save()
    }
    time("bm25_100k") {
      // BM25 over the 100k-doc big table: token scan + dl aggregate are the corpus
      // costs; tf is pruned to query terms before any join
      operators.TextAnalysis.bm25(bd, Seq("data", "join", "scan"))
        .write.format("noop").mode("overwrite").save()
    }
    time("pca_100k") {
      // three corpus scans folded to 64 fixed-point rows each — the
      // PageRank cost profile with dim instead of nodes
      val bigEmb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      operators.Similarity.pcaTopComponent(bigEmb)
        .write.format("noop").mode("overwrite").save()
    }
    time("calib_100k") {
      // calibration card at 100k docs: 3 training sweeps + one
      // bucket-grain integer fold, all map-side combinable
      operators.QualityModel.calibrationCard(bd)
        .write.format("noop").mode("overwrite").save()
    }
    // BUCKETED vs FULL-REWRITE MV refresh as stored keys grow 10×:
    // the full rung re-materializes every stored key per refresh, so
    // its per-refresh cost tracks state size; the bucketed rung merges
    // only the buckets the (fixed, small) delta touches, so its cost
    // must stay FLAT — the round-12 verdict row. Same 100-key delta
    // against 200k- vs 2M-key stored states, 64 buckets.
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-bmv").toString
      val cat = new graft.sources.Catalog(spark, root)
      def keysDf(n: Long) = spark.range(n)
        .select(concat(lit("k"), col("id")).as("k"), lit(1L).as("cnt"))
      def delta = spark.range(5)
        .select(concat(lit("k"), col("id")).as("k"), lit(1L).as("cnt"))
      // wall-clock at this size is fixed job overhead on both rungs;
      // the scale signal is WRITE AMPLIFICATION — parquet bytes the
      // refresh rewrote (files newer than the refresh start). The full
      // rung rewrites the whole state (10× keys → ~10× bytes); the
      // bucketed rung rewrites only the ≤ 5 touched buckets, and with
      // B sized to the key cardinality (64 → 640 here — the knob every
      // deployment sets from expected keys) the touched-bucket bytes
      // stay FLAT as the state grows 10×.
      def rewrittenBytes(name: String, since: Long): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet") && f.lastModified() >= since)
            f.length()
          else 0L
        walk(new java.io.File(s"${cat.derivedDir}/$name"))
      }
      Seq(("1x", 200000L, 64), ("10x", 2000000L, 640)).foreach { case (tag, n, b) =>
        cat.refreshAggMv(s"flat_$tag", keysDf(n), Seq("k"))
        cat.refreshAggMvBucketed(s"bkt_$tag", keysDf(n), Seq("k"), b)
        Thread.sleep(1100) // mtime granularity
        val t0 = System.currentTimeMillis()
        time(s"mv_refresh_full_$tag") {
          cat.refreshAggMv(s"flat_$tag", delta, Seq("k")): Unit
        }
        println(f"[scale] mv_full_${tag}_rewrote   ${rewrittenBytes(s"flat_$tag", t0) / 1024.0}%10.1f KiB")
        val t1 = System.currentTimeMillis()
        time(s"mv_refresh_bucketed_$tag") {
          cat.refreshAggMvBucketed(s"bkt_$tag", delta, Seq("k"), b): Unit
        }
        println(f"[scale] mv_bkt_${tag}_rewrote    ${rewrittenBytes(s"bkt_$tag", t1) / 1024.0}%10.1f KiB")
      }
    }
    // SCD2 open state, flat vs bucketed, as OPEN keys grow 10×: the
    // round-13 rung. Closed history is append-only on both (O(batch)
    // segments); the signal is the OPEN-state write amplification of
    // a 5-key delta — the flat rung tmp-swaps every open key, the
    // bucketed rung rewrites only the ≤ 5 touched buckets.
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-scd2b").toString
      val cat = new graft.sources.Catalog(spark, root)
      def changesDf(n: Long, seq: Long) = spark.range(n)
        .select(concat(lit("k"), col("id")).as("k"), col("id").as("v"),
          lit(seq).as("seq"), lit("u").as("op"))
      def rewrittenBytes(name: String, since: Long): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet") && f.lastModified() >= since)
            f.length()
          else 0L
        walk(new java.io.File(s"${cat.derivedDir}/$name/open"))
      }
      Seq(("1x", 200000L, 64), ("10x", 2000000L, 640)).foreach { case (tag, n, b) =>
        cat.refreshScd2Mv(s"sflat_$tag", changesDf(n, 1L), "k", "seq", "op", 0L)
        cat.refreshScd2MvBucketed(s"sbkt_$tag", changesDf(n, 1L),
          "k", "seq", "op", 0L, b)
        val delta = changesDf(5L, 2L)
        Thread.sleep(1100) // mtime granularity
        val t0 = System.currentTimeMillis()
        time(s"scd2_refresh_full_$tag") {
          cat.refreshScd2Mv(s"sflat_$tag", delta, "k", "seq", "op", 1L)
        }
        println(f"[scale] scd2_full_${tag}_rewrote ${rewrittenBytes(s"sflat_$tag", t0) / 1024.0}%10.1f KiB")
        val t1 = System.currentTimeMillis()
        time(s"scd2_refresh_bucketed_$tag") {
          cat.refreshScd2MvBucketed(s"sbkt_$tag", delta, "k", "seq", "op", 1L, b)
        }
        println(f"[scale] scd2_bkt_${tag}_rewrote  ${rewrittenBytes(s"sbkt_$tag", t1) / 1024.0}%10.1f KiB")
      }
    }
    // Zone-map probe as the table (and its file count) grows 10×: the
    // planning read is the bounded sidecar and the data read is only
    // the files the range intersects — both follow the RANGE, not the
    // table, so a fixed narrow probe stays flat while the full scan it
    // replaces pays the 10×.
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-zm").toString
      val cat = new graft.sources.Catalog(spark, root)
      Seq(("1x", 2000000L, 64), ("10x", 20000000L, 640)).foreach {
        case (tag, n, files) =>
          if (selected(s"zonemap_probe_$tag") ||
              selected(s"zonemap_fullscan_$tag")) {
            val dest = s"$root/t_$tag"
            val df = spark.range(n).select(col("id"),
              pmod(hash(col("id")), lit(1000000)).cast("long").as("k"))
            cat.writeSorted(df, dest, files, "k") // tight per-file ranges
            cat.buildZoneMap(dest, Seq("k"))
            time(s"zonemap_probe_$tag") {
              cat.scanZoneMapped(dest, "k", lit(1000L), lit(2000L))
                .write.format("noop").mode("overwrite").save()
            }
            val opened = cat.scanZoneMapped(dest, "k", lit(1000L), lit(2000L))
              .inputFiles.length
            println(s"[scale] zonemap_${tag}_opened $opened of $files files")
            time(s"zonemap_fullscan_$tag") {
              spark.read.parquet(dest).where(col("k").between(1000L, 2000L))
                .write.format("noop").mode("overwrite").save()
            }
          }
      }
    }
    spark.stop()
  }
}
