package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition a
  * training-data owner actually runs, built only from this library's
  * individually-verified operators:
  *
  *   1. signal pass: quality score + language ID in ONE map-only scan
  *      (expressions fused so the corpus is read once, not per signal)
  *   2. filter: quality floor + language allowlist (map-only)
  *   3. dedup ladder: exact (hash groupBy) → MinHash-LSH near-dup over
  *      the keepers → transitive chain resolution (connected
  *      components), keeping each dup cluster's smallest doc
  *   4. benchmark decontamination: drop docs sharing ≥ k shingles with
  *      any benchmark doc (benchmark side broadcasts)
  *   5. deterministic train/val/test split (salted-hash, map-only)
  *
  * Every stage is a declarative plan; the only wide shuffles are the
  * ones the algorithms require (dedup signature aggregation, candidate
  * join, component propagation over the pair set). The optional audit
  * recounts each stage — each count is an action that re-executes its
  * lineage, so it defaults OFF and belongs in validation runs, not the
  * 100 TB production pass.
  */
object CorpusPipeline {

  case class Config(
      minQuality: Double = 0.3,
      langs: Set[String] = Set.empty, // empty = keep every language
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      jaccard: Double = 0.5,
      maxBucket: Int = 0,
      minSharedShingles: Long = 3)

  /** `release()` unpersists the pinned intermediates — call it once the
    * corpus has been written out (or fully consumed). Without it a
    * session that runs prepare() repeatedly accumulates pins.
    * `stages` carries each stage's surviving frame (input → … → clean)
    * for attrition reporting — the same objects the pipeline composed,
    * so counting them reuses the pins. */
  case class Result(corpus: DataFrame, audit: Seq[(String, Long)],
      pinned: Seq[DataFrame] = Nil,
      stages: Seq[(String, DataFrame)] = Nil,
      dropSets: Seq[(String, DataFrame)] = Nil) {
    def release(): Unit = pinned.foreach(_.unpersist(false))
  }

  /** Quality + language signals fused into one scan: the same
    * expressions as TextAnalysis.quality / langId (which stay separate
    * because each is an oracle-verified query), evaluated together so
    * the corpus is read once. */
  def signals(docs: DataFrame): DataFrame = {
    import TextAnalysis._
    val base = docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("text"), col("tk"),
        length(col("text")).as("nc"),
        size(col("tk")).as("nw_raw"),
        length(regexp_replace(col("text"), "[^a-z]", "")).as("na"),
        length(regexp_replace(col("text"), "[^.!?,;:]", "")).as("np"),
        hitCount(col("tk"), EnStopwords).as("h_en"),
        hitCount(col("tk"), EsStopwords).as("h_es"),
        hitCount(col("tk"), FrStopwords).as("h_fr"),
        hitCount(col("tk"), DeStopwords).as("h_de"),
        hitCount(col("tk"), ZhStopwords).as("h_zh"))
    val nWords = greatest(col("nw_raw"), lit(1))
    val nChars = greatest(col("nc"), lit(1))
    base.select(
      col("doc_id"), col("text"),
      (col("h_en").cast("double") / nWords * 0.4
        + least(col("na").cast("double") / nWords / 10.0, lit(1.0)) * 0.3
        + (lit(1.0) - col("np").cast("double") / nChars) * 0.3).as("quality_score"),
      when(col("h_en") >= greatest(col("h_es"), col("h_fr"), col("h_de"), col("h_zh")), "en")
        .when(col("h_es") >= greatest(col("h_fr"), col("h_de"), col("h_zh")), "es")
        .when(col("h_fr") >= greatest(col("h_de"), col("h_zh")), "fr")
        .when(col("h_de") >= col("h_zh"), "de")
        .otherwise("zh").as("pred_lang"))
  }

  /** ONE fused corpus scan for the whole pipeline (round 9 stage
    * fusion): quality + language signals, the exact-dedup content
    * digest, and the MinHash signature (LSH minhashes + distinct
    * shingle-hash set) all emitted from a single map-only pass. The
    * token array flows BETWEEN the projections as a column, so the
    * text is tokenized exactly once; the quality/language filter sits
    * between scoring and signing, so dropped rows never pay the
    * k-hash signing. Every expression is the SAME kernel its
    * standalone operator uses (TextAnalysis signals, md5 digest,
    * [[Dedup.signatures]]' row-local MinHashSig), so downstream values
    * — and every oracle — are bit-identical to the unfused stages. */
  private[graft] def fusedScan(docs: DataFrame, cfg: Config): DataFrame = {
    import TextAnalysis._
    val base = docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("tk"),
        md5(encode(col("text"), "UTF-8")).as("h"))
      .select(col("doc_id"), col("text"), col("tk"), col("h"),
        length(col("text")).as("nc"),
        size(col("tk")).as("nw_raw"),
        length(regexp_replace(col("text"), "[^a-z]", "")).as("na"),
        length(regexp_replace(col("text"), "[^.!?,;:]", "")).as("np"),
        hitCount(col("tk"), EnStopwords).as("h_en"),
        hitCount(col("tk"), EsStopwords).as("h_es"),
        hitCount(col("tk"), FrStopwords).as("h_fr"),
        hitCount(col("tk"), DeStopwords).as("h_de"),
        hitCount(col("tk"), ZhStopwords).as("h_zh"))
    val nWords = greatest(col("nw_raw"), lit(1))
    val nChars = greatest(col("nc"), lit(1))
    val scored = base.select(
      col("doc_id"), col("text"), col("tk"), col("h"),
      (col("h_en").cast("double") / nWords * 0.4
        + least(col("na").cast("double") / nWords / 10.0, lit(1.0)) * 0.3
        + (lit(1.0) - col("np").cast("double") / nChars) * 0.3).as("quality_score"),
      when(col("h_en") >= greatest(col("h_es"), col("h_fr"), col("h_de"), col("h_zh")), "en")
        .when(col("h_es") >= greatest(col("h_fr"), col("h_de"), col("h_zh")), "es")
        .when(col("h_fr") >= greatest(col("h_de"), col("h_zh")), "fr")
        .when(col("h_de") >= col("h_zh"), "de")
        .otherwise("zh").as("pred_lang"))
    scored
      .where(col("quality_score") >= cfg.minQuality &&
        (if (cfg.langs.isEmpty) lit(true) else col("pred_lang").isin(cfg.langs.toSeq: _*)))
      .select(col("doc_id"), col("text"), col("h"),
        col("quality_score"), col("pred_lang"),
        graft.functions.MinHashSig.minhashSig(col("tk"), cfg.shingleN,
          cfg.numHashes).as("s"))
  }

  /** Run the full preparation. `benchmark` is the eval set to
    * decontaminate against (None skips the stage).
    *
    * The pipeline reads the corpus text ONCE ([[fusedScan]]); the
    * exact-dedup keeper is one `row_number` window over the content
    * digest (replacing the old aggregate + join-back — one exchange
    * instead of three), the LSH stage consumes the scan's signatures
    * ([[Dedup.minhashLshSigned]]) instead of re-tokenizing, and
    * decontamination explodes the scan's distinct shingle-hash set
    * instead of re-shingling the surviving corpus.
    *
    * `persistIntermediates` caches the two fan-out points (the signed
    * post-window frame feeds the keeper filter AND the attrition
    * counts; `deduped` feeds decontamination AND the result) with
    * evictable MEMORY_AND_DISK storage. A 100 TB deployment should
    * instead write those stage outputs to storage
    * (Catalog.writeChunked) and read them back; the in-session persist
    * is for single-run use. */
  def prepare(docs: DataFrame, benchmark: Option[DataFrame] = None,
      cfg: Config = Config(), audit: Boolean = false,
      persistIntermediates: Boolean = true): Result = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val steps = Seq.newBuilder[(String, Long)]
    def note(name: String, df: DataFrame): DataFrame = {
      if (audit) steps += name -> df.count()
      df
    }
    val pins = Seq.newBuilder[DataFrame]
    def pin(df: DataFrame): DataFrame =
      if (persistIntermediates) { pins += df; df.persist(StorageLevel.MEMORY_AND_DISK) }
      else df

    note("input", docs)
    // one corpus read: signals + digest + signatures in the pin.
    // (A pre-scan repartition to parallelize single-split inputs was
    // measured and REJECTED: at bench SF the extra exchange + stage
    // cost more than the single-core signing it spread out, and at
    // production scale the input has more splits than cores anyway.)
    val filtered = note("after_quality_lang", pin(fusedScan(docs, cfg)))
    // exact-dedup losers (every non-min doc_id of a content-hash clone
    // cluster) rank over a TWO-COLUMN projection of the pin — the only
    // thing that shuffles is (doc_id, h), never text or signatures —
    // and come back as a broadcast anti-join. Losers are O(clones):
    // broadcast-sized whenever exact dedup is feasible at all.
    val losers = filtered.select(col("doc_id"), col("h"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .where(col("__rn") > 1).select(col("doc_id"))
    val unique = note("after_exact_dedup",
      filtered.join(broadcast(losers), Seq("doc_id"), "left_anti"))
    val sigCols = col("doc_id") +:
      (0 until cfg.numHashes).map(i =>
        element_at(col("s.mh"), i + 1).as(s"mh$i")) :+ col("s.ss").as("ss")
    val pairs = Dedup.minhashLshSigned(
      unique.where(col("s").isNotNull).select(sigCols: _*),
      cfg.numHashes, cfg.bands, cfg.jaccard, cfg.maxBucket)
    // [[Dedup.applyDedupTransitive]] inlined so the DROP SET is a named
    // frame: attrition counts it directly (each stage is a subset of
    // the previous, so survivor counts are running differences) instead
    // of recounting the stacked anti-joined frames
    val comp = Dedup.connectedComponents(pairs)
    val nearDrops = comp.where(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    val deduped = note("after_near_dedup",
      pin(unique.join(nearDrops, Seq("doc_id"), "left_anti")))

    val (clean, flaggedSet) = benchmark match {
      case Some(bench) =>
        // shared-shingle flags from the scan's distinct shingle sets —
        // the same values Dedup.contamination derives by re-shingling
        val corpusShingles = deduped
          .select(col("doc_id"), explode(col("s.ss")).as("sh"))
        val benchShingles = Dedup.hashedShingles(bench, cfg.shingleN).distinct()
          .select(col("h").as("sh"), col("doc_id").as("bench_id"))
        // no distinct: left_anti below is duplicate-insensitive, and
        // the extra exchange buys nothing
        val flagged = corpusShingles.join(broadcast(benchShingles), "sh")
          .groupBy(col("doc_id"), col("bench_id"))
          .agg(count(lit(1)).as("n_shared"))
          .where(col("n_shared") >= cfg.minSharedShingles)
          .select(col("doc_id"))
        (note("after_decontamination",
          deduped.join(flagged, Seq("doc_id"), "left_anti")), Some(flagged))
      case None => (deduped, None)
    }

    // split assignment is a pure column — no join, stays map-only
    val split = clean.withColumn("split", Sampling.splitColumn(col("doc_id")))
      .drop("h", "s")
    Result(split, steps.result(), pins.result(), Seq(
      "input" -> docs, "quality_lang" -> filtered, "exact_dedup" -> unique,
      "near_dedup" -> deduped, "decontaminated" -> clean),
      Seq("exact_losers" -> losers, "near_drops" -> nearDrops) ++
        flaggedSet.map("contaminated" -> _))
  }

  /** Attrition report — "where did my data go": surviving document
    * count after each stage. One MELTED counting pass (round 14):
    * instead of recounting each progressively-stacked stage frame —
    * whose five union branches each re-planned the full pipeline and
    * whose broadcast subtrees raced the cache fill (measured: eight
    * concurrent ~0.8 s jobs all recomputing the unfilled scan) — the
    * job counts the input, the filtered frame, and the three DROP SETS
    * (exact losers, near-dup drops, contaminated ids), each a tiny
    * O(drops) frame computed exactly once. Stage survivor counts are
    * the running differences, identical by construction because every
    * stage is a subset of its predecessor: losers ⊆ filtered's ids
    * (one row per doc), near-drops ⊆ unique's ids (one row per paired
    * id), flagged ⊆ deduped's ids. Collected eagerly so the pins can
    * be released before the 5-literal-row result escapes. */
  def attrition(docs: DataFrame, benchmark: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val r = prepare(docs, benchmark, cfg)
    try {
      val drops = r.dropSets.toMap
      val filtered = r.stages.toMap.apply("quality_lang")
      val branches = Seq(
        docs.agg(count(lit(1)).as("n")).select(lit("input").as("s"), col("n")),
        filtered.agg(count(lit(1)).as("n"))
          .select(lit("quality_lang").as("s"), col("n")),
        drops("exact_losers").agg(count(lit(1)).as("n"))
          .select(lit("exact_losers").as("s"), col("n")),
        drops("near_drops").agg(count(lit(1)).as("n"))
          .select(lit("near_drops").as("s"), col("n"))) ++
        drops.get("contaminated").map(f => f.distinct()
          .agg(count(lit(1)).as("n")).select(lit("contaminated").as("s"), col("n")))
      val m = branches.reduce(_ unionAll _)
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      val nQl = m("quality_lang")
      val nEx = nQl - m("exact_losers")
      val nNd = nEx - m("near_drops")
      Seq(
        "input" -> m("input"), "quality_lang" -> nQl, "exact_dedup" -> nEx,
        "near_dedup" -> nNd,
        "decontaminated" -> (nNd - m.getOrElse("contaminated", 0L)))
        .toDF("stage", "n_docs")
    } finally r.release()
  }

  /** INCREMENTAL preparation — the daily-batch shape: a new batch is
    * prepared against an IMMUTABLE existing corpus represented only by
    * its signature index ([[graft.operators.Dedup.buildMinhashIndex]]
    * over the FULL pre-dedup corpus — dropped docs included, so chains
    * through them are seen). Corpus text is never re-read; corpus
    * membership never changes.
    *
    *   1. signal pass + quality/language filter (map-only, batch only)
    *   2. exact dedup WITHIN the batch
    *   3. near-dup pairs within the batch (LSH over keepers)
    *   4. cross flags: batch keepers sharing an LSH-verified pair with
    *      ANY corpus signature ([[Dedup.dedupAgainstIndex]])
    *   5. component resolution with corpus priority: a batch component
    *      touching the corpus is dropped ENTIRELY (its representative
    *      already lives in the corpus); a batch-only component keeps
    *      its min id
    *   6. decontamination + split, as in [[prepare]]
    *
    * When batch ids are newer than all corpus ids (the production
    * invariant), the admitted set EQUALS the batch rows of a monolithic
    * [[prepare]] over corpus ∪ batch (spec-asserted) — at a fraction of
    * the cost, since the corpus side is only probed through the index.
    * Sign the admitted docs ([[Dedup.buildMinhashIndex]]) and append to
    * the index to absorb the batch. */
  def prepareIncrement(newDocs: DataFrame, corpusIndex: DataFrame,
      benchmark: Option[DataFrame] = None, cfg: Config = Config(),
      persistIntermediates: Boolean = true): Result = {
    import org.apache.spark.storage.StorageLevel
    val pins = Seq.newBuilder[DataFrame]
    def pin(df: DataFrame): DataFrame =
      if (persistIntermediates) { pins += df; df.persist(StorageLevel.MEMORY_AND_DISK) }
      else df

    // the batch rides the same fused scan as [[prepare]]: signals +
    // digest + signature in one read, the batch signed exactly ONCE
    // (both the in-batch LSH and the index probe reuse the scan's
    // signatures — the unfused form re-signed the batch per consumer)
    val filtered = pin(fusedScan(newDocs, cfg))
    val losers = filtered.select(col("doc_id"), col("h"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("h")).orderBy(col("doc_id"))))
      .where(col("__rn") > 1).select(col("doc_id"))
    val unique = pin(filtered.join(broadcast(losers), Seq("doc_id"), "left_anti"))
    val sigCols = col("doc_id") +:
      (0 until cfg.numHashes).map(i =>
        element_at(col("s.mh"), i + 1).as(s"mh$i")) :+ col("s.ss").as("ss")
    val signed = unique.where(col("s").isNotNull).select(sigCols: _*)
    val pairs = Dedup.minhashLshSigned(signed, cfg.numHashes,
      cfg.bands, cfg.jaccard, cfg.maxBucket)
    val crossIds = Dedup.dedupAgainstIndexSigned(corpusIndex, signed,
      cfg.numHashes, cfg.bands, cfg.jaccard, cfg.maxBucket)
      .select(col("new_id").as("doc_id")).distinct()

    // batch components (unpaired docs are their own component), then
    // corpus priority: kill whole components that touch the corpus
    val comp = Dedup.connectedComponents(pairs)
    val compAll = unique.select(col("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
    val corpusComps = compAll.join(crossIds, "doc_id")
      .select(col("component")).distinct()
    val keepIds = compAll
      .join(corpusComps, Seq("component"), "left_anti")
      .groupBy(col("component")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val admitted = unique.join(keepIds, "doc_id")

    val clean = benchmark match {
      case Some(bench) =>
        // decontamination from the scan's shingle sets, as in [[prepare]]
        val benchShingles = Dedup.hashedShingles(bench, cfg.shingleN).distinct()
          .select(col("h").as("sh"), col("doc_id").as("bench_id"))
        val flagged = admitted
          .select(col("doc_id"), explode(col("s.ss")).as("sh"))
          .join(broadcast(benchShingles), "sh")
          .groupBy(col("doc_id"), col("bench_id"))
          .agg(count(lit(1)).as("n_shared"))
          .where(col("n_shared") >= cfg.minSharedShingles)
          .select(col("doc_id"))
        admitted.join(flagged, Seq("doc_id"), "left_anti")
      case None => admitted
    }
    val split = clean.withColumn("split", Sampling.splitColumn(col("doc_id")))
      .drop("h", "s")
    Result(split, Nil, pins.result())
  }

  /** Storage-checkpointed, RESUMABLE preparation — the 100 TB shape.
    * Each stage's output is written to `stageDir/<stage>` and a stage
    * is skipped (read back instead of recomputed) when its `_SUCCESS`
    * marker exists, so a failure at stage N restarts at stage N, not at
    * the raw corpus. The in-session [[prepare]] is for single-run use;
    * this variant is what a scheduler retries. Stage outputs are plain
    * parquet — inspectable, and a natural audit trail. */
  def prepareStaged(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      stageDir: String, benchmark: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    def done(p: String): Boolean = {
      val m = new Path(s"$p/_SUCCESS")
      m.getFileSystem(conf).exists(m)
    }
    def stage(name: String)(build: => DataFrame): DataFrame = {
      val p = s"$stageDir/$name"
      if (!done(p)) build.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    val unique = stage("unique") {
      val filtered = signals(docs)
        .where(col("quality_score") >= cfg.minQuality &&
          (if (cfg.langs.isEmpty) lit(true) else col("pred_lang").isin(cfg.langs.toSeq: _*)))
      val keepers = Dedup.exact(filtered).select(col("keep_id").as("doc_id"))
      filtered.join(keepers, "doc_id")
    }
    val deduped = stage("deduped") {
      val pairs = Dedup.minhashLsh(unique, cfg.shingleN, cfg.numHashes,
        cfg.bands, cfg.jaccard, cfg.maxBucket)
      Dedup.applyDedupTransitive(unique, pairs)
    }
    val clean = benchmark match {
      case Some(bench) => stage("clean") {
        val flagged = Dedup.contamination(deduped, bench, cfg.shingleN, cfg.minSharedShingles)
          .select(col("doc_id")).distinct()
        deduped.join(flagged, Seq("doc_id"), "left_anti")
      }
      case None => deduped
    }
    clean.withColumn("split", Sampling.splitColumn(col("doc_id")))
  }

  /** PUBLISH — the dataset-release verb: [[prepare]] the corpus, give
    * it the deterministic training order/sharding, and COMMIT the
    * release as Catalog-owned durable state with its audit sidecars:
    * `<dest>/shards` (the kept docs + split/pos/shard), `/manifest`
    * (per-shard doc/token/char/source census), `/datasheet` (the
    * integer corpus card), `/contract` (text-nonempty + unique-id
    * violations — a publisher gates on max == 0). Everything rides
    * [[graft.sources.Catalog.saveDerived]]'s tmp-swap + `_SUCCESS`,
    * so a torn publish never serves and a FRESH session reads the
    * release from disk alone. Returns the release summary as an
    * integer (metric, value) card. */
  def publish(cat: graft.sources.Catalog, docs: DataFrame, dest: String,
      shardSize: Long = 1000): DataFrame = {
    val r = prepare(docs)
    try {
      val kept = docs.join(r.corpus.select(col("doc_id"), col("split")), "doc_id")
      val sharded = kept.join(
        Sampling.shuffleOrder(kept, shardSize), "doc_id")
      cat.saveDerived(s"$dest/shards", sharded)
      cat.saveDerived(s"$dest/manifest",
        Sampling.shardManifest(kept, shardSize))
      cat.saveDerived(s"$dest/datasheet", TextAnalysis.datasheet(kept))
      cat.saveDerived(s"$dest/contract",
        graft.sources.Catalog.contractCard(kept,
          predicates = Seq("text_nonempty" -> (length(col("text")) > 0)),
          uniqueKeys = Seq("doc_id_unique" -> "doc_id")))
    } finally r.release()
    val sh = cat.loadDerived(s"$dest/shards")
    val base = sh.agg(count(lit(1)).as("n_docs"),
      countDistinct(col("shard")).as("n_shards"))
    val viol = cat.loadDerived(s"$dest/contract")
      .agg(max(col("n_violations")).as("max_violations"))
    val one = base.crossJoin(broadcast(viol))
    Seq("n_docs", "n_shards", "max_violations").map(m =>
        one.select(lit(m).as("metric"), col(m).cast("long").as("value")))
      .reduce(_ unionAll _)
  }
}
