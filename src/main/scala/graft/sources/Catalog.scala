package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage engine facade — the Spark-first re-expression of the
  * reference DFS (reference: dfs/controller/fileIndex.go table index;
  * dfs/client/{uploader,downloader,chunkinator}.go).
  *
  * The reference hand-rolls chunking, replication, and parallel
  * retrieval; on Spark those jobs belong to the storage layer (HDFS/S3
  * replication) and the parquet reader (splittable files, parallel
  * scan). What remains engine-side is the useful surface: a table
  * registry, format-agnostic IO, chunk-size-controlled writes, and
  * cluster-stats-style introspection.
  *
  * Replication factor (the reference's hardcoded 3-way placement,
  * client/chunkinator.go + controller): delegated to the filesystem. A
  * deployment sets it per-cluster via `dfs.replication` in
  * hdfs-site.xml, or per-job with
  * `spark.hadoop.dfs.replication=3` on submit — every write this class
  * does then inherits it; object stores (S3/GCS) replicate internally
  * and ignore it. Nothing engine-side to schedule.
  */
class Catalog(spark: SparkSession, baseDir: String) {

  /** `ls` — table names present in the base dir (file index analog). */
  def list(): Seq[String] = {
    val fs = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(baseDir)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  def table(name: String): DataFrame =
    spark.read.parquet(s"$baseDir/$name.parquet")

  def read(name: String, format: String = "parquet"): DataFrame = format match {
    case "parquet" => table(name)
    case "csv" => spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$baseDir/$name.csv")
    case "json" => spark.read.json(s"$baseDir/$name.json")
    case "text" => spark.read.text(s"$baseDir/$name.txt")
    case "orc" => spark.read.orc(s"$baseDir/$name.orc")
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  /** Register every table as a temp view so `spark.sql` works directly. */
  def registerAll(): Unit =
    list().foreach(n => table(n).createOrReplaceTempView(n))

  /** Upload analog: write with bounded chunk size (chunkinator.go).
    * `maxRecordsPerFile` bounds file size without an extra shuffle;
    * `numChunks` forces an explicit chunk count via repartition (one
    * shuffle) when downstream wants uniform chunks. */
  def writeChunked(df: DataFrame, dest: String, maxRecordsPerFile: Long,
      numChunks: Option[Int] = None): Unit = {
    val out = numChunks.map(df.repartition(_)).getOrElse(df)
    out.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dest)
  }

  /** Globally-sorted write (reference: MapReduce jobs store their
    * externally-sorted output back to the DFS): range-repartition on the
    * sort keys + per-partition sort, so file part-N holds keys ≤ every
    * key in part-N+1 and each file is internally sorted — a distributed
    * external sort whose merge step is just reading files in order.
    * Range boundaries come from reservoir sampling (one extra pass),
    * after which no worker ever holds more than its slice. */
  def writeSorted(df: DataFrame, dest: String, numFiles: Int,
      sortCols: String*): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dest)

  /** Z-order clustered write: range-partition + sort on the interleaved
    * Morton value of two filter columns, so each output file holds a
    * contiguous Z range — a rectangle-ish region in (x, y) space. A scan
    * filtering on EITHER column then prunes most files from parquet
    * min/max footers alone, which one-column sorting only provides for
    * its leading column. The standard lakehouse layout move for 100 TB
    * fact tables with two independent filter dimensions. */
  def writeZOrdered(df: DataFrame, dest: String, numFiles: Int,
      xCol: String, yCol: String): Unit =
    writeZOrderedN(df, dest, numFiles, Seq(xCol, yCol))

  /** N-column Z-ordered write (see [[Catalog.zValueN]]): each file gets
    * a contiguous Z range, so min/max footer pruning works on every one
    * of the `zCols`, not just a leading sort column. */
  def writeZOrderedN(df: DataFrame, dest: String, numFiles: Int,
      zCols: Seq[String]): Unit =
    df.withColumn("_z", Catalog.zValueN(zCols.map(col)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(dest)

  /** Partitioned-by write — hive-style layout for partition pruning. */
  def writePartitioned(df: DataFrame, dest: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(dest)

  /** Bucketed managed table: co-locates rows by join key so repeated
    * joins/aggregations on that key skip the exchange entirely — the
    * bucketing IS the pre-shuffle, paid once at write time. The 100 TB
    * pattern for fact-fact joins too big to broadcast. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit = {
    // idempotent against a metastore/warehouse mismatch (e.g. a fresh
    // metastore with a leftover table directory from an aborted run).
    // The stale path is resolved FROM the metastore (actual location if
    // the table exists, its would-be default path otherwise) — a
    // name-concatenated warehouse path would miss non-default databases,
    // case-normalized names, and external tables.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    val staleLoc: java.net.URI =
      if (spark.catalog.tableExists(tableName))
        spark.sessionState.catalog.getTableMetadata(ident).location
      else spark.sessionState.catalog.defaultTablePath(ident)
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val loc = new Path(staleLoc)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Delete analog (reference: dfs/client delete → controller drops the
    * index entry and storage nodes drop chunks). Returns whether the
    * table existed. */
  def delete(name: String): Boolean = {
    val p = new Path(s"$baseDir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Download analog (reference: dfs/client/downloader.go — parallel
    * chunk fetch + single-file reassembly): parallel distributed read,
    * then a single reassembled output file. The coalesce(1) sink is a
    * deliberate 1-task bottleneck — only for taking a table OUT of the
    * cluster; cluster-to-cluster copies should stay chunked. */
  def download(name: String, destDir: String): Unit =
    table(name).coalesce(1).write.mode(SaveMode.Overwrite).parquet(destDir)

  /** All parquet data files under `p`, recursing into subdirectories so
    * hive-partitioned (nested) layouts count correctly instead of
    * silently yielding zero files. */
  private def parquetFiles(p: Path): Seq[Path] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq
        .filterNot(_.getPath.getName.startsWith("_"))
        .flatMap { s =>
          if (s.isDirectory) parquetFiles(s.getPath)
          else Seq(s.getPath).filter(_.getName.endsWith(".parquet"))
        }
    else Seq(p)
  }

  /** Exact row count from parquet footers — no data scan. */
  def footerRowCount(p: Path): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    parquetFiles(p).map { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try reader.getRecordCount finally reader.close()
    }.sum
  }

  /** Cluster-stats analog (reference: dfs/storageNode/stats.go): rows +
    * bytes per table, from parquet footers ONLY — a pure metadata
    * operation like the reference's controller index lookup; no data
    * scan regardless of table size. */
  def stats(): DataFrame = {
    val fs = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = list().map { n =>
      val p = new Path(s"$baseDir/$n.parquet")
      (n, footerRowCount(p), fs.getContentSummary(p).getLength)
    }
    import spark.implicits._
    rows.toDF("tbl", "n_rows", "bytes")
  }

  /** Small-file compaction — the operational inverse of the chunkinator:
    * long-lived tables accrete many small files (streaming sinks,
    * incremental appends), and file-open overhead eventually dominates
    * scans. Target file count comes from footer metadata (no scan) and
    * the rewrite uses coalesce — a narrow dependency, NO shuffle: each
    * output task concatenates a set of input partitions. Returns the
    * file count actually written (listed from dest — coalesce gives
    * uneven partitions and maxRecordsPerFile can split an oversized
    * task, so the pre-computed target is only a target). */
  def compact(src: String, dest: String, targetRecordsPerFile: Long): Int = {
    val rows = footerRowCount(new Path(src))
    val nFiles = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    spark.read.parquet(src)
      .coalesce(nFiles)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(dest)
    parquetFiles(new Path(dest)).length
  }

  /** Oracle-friendly per-table row counts (no filesystem columns).
    * Footer metadata via [[stats]] — exact counts with zero data scanned,
    * like the reference controller answering `ls` from its index. */
  def rowCounts(): DataFrame = stats().select(col("tbl"), col("n_rows"))

  /** Per-NODE operational stats (reference: dfs/storageNode/stats.go —
    * per-node free space and request counters). On Spark the executors
    * are the storage/compute nodes; the status tracker answers the same
    * questions: where my workers are, what they are running, and how
    * much block-storage memory each holds. Pure driver-side metadata —
    * identical API on local[n] and a 1000-executor cluster. */
  def executorStats(): DataFrame = {
    import spark.implicits._
    spark.sparkContext.statusTracker.getExecutorInfos.toSeq
      .map { e =>
        (e.host, e.port, e.numRunningTasks,
          e.usedOnHeapStorageMemory + e.usedOffHeapStorageMemory,
          e.totalOnHeapStorageMemory + e.totalOffHeapStorageMemory)
      }
      .toDF("host", "port", "running_tasks", "used_storage_bytes", "total_storage_bytes")
  }
}

object Catalog {
  import org.apache.spark.sql.functions._

  /** Morton/Z-value of two integer columns: the low `bits` bits of each,
    * interleaved (x even positions, y odd). Bit shifts and masks only —
    * portable to any engine — and the disjoint bit positions make `+`
    * equal to OR, so the whole value is one codegen'd arithmetic
    * expression. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** N-column Morton/Z-value: bit `i` of column `j` lands at position
    * `i·N + j`, the round-robin interleave that generalizes the 2-dim
    * layout above (j = 0 even positions, j = 1 odd). Same portability
    * arguments; `bits · N` must fit a signed long. With the low `bits`
    * bits of every column riding the value, a range-partitioned sort on
    * it gives every file a contiguous Z range — a hyper-rectangle-ish
    * region of the N-dim key space — so a filter on ANY of the N
    * columns prunes most files from parquet min/max footers alone,
    * which a lexicographic sort only provides for its leading column.
    * More dimensions dilute per-dimension locality (each column's bits
    * are N positions apart), so keep N to the 2–4 filter dimensions
    * that matter. */
  def zValueN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 1, "zValueN needs at least one column")
    require(bits * n <= 63, s"bits ($bits) × columns ($n) must fit a signed long")
    // widen to long FIRST: with IntegerType inputs, a high bit would
    // shift past bit 31 and wrap an Int negative, breaking the
    // contiguous-Z-range property
    val longs = cols.map(_.cast("long"))
    (for {
      i <- 0 until bits
      (c, j) <- longs.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(1), i * n + j)).reduce(_ + _)
  }

  /** MERGE/upsert (latest-wins): rows of `updates` replace same-key
    * rows of `base`; unmatched update rows insert. One anti join on the
    * key — hash-partitioned both sides, no full-table rewrite logic on
    * the compute side (the storage rewrite is the caller's
    * `writeChunked`/`writePartitioned`, which at scale should target
    * only the partitions the update keys touch). Schemas must match by
    * name (`unionByName`). PRECONDITION: update keys must be non-null
    * and unique within the batch — a null key never anti-matches (both
    * the stale base row and the update row would survive), and two
    * updates for one key both land (no within-batch ordering exists to
    * pick a winner; dedupe upstream where one is defined). */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      base.join(updates.select(col(key)), Seq(key), "left_anti"))

  /** Incremental aggregate maintenance (materialized-view merge): the
    * base aggregate is PERSISTED once per `cacheKey` per JVM (a real
    * parquet round-trip under the shutdown-cleaned temp root — the
    * stored MV), then each call merges a delta-batch aggregate into the
    * stored state by re-aggregating the union on the keys. Correct for
    * exactly the algebraic aggregates (counts, integer sums) whose
    * partial states combine by summation — which is why callers
    * pre-aggregate to (keys, counters) grain before handing frames in.
    * At 100 TB this is the difference between re-scanning the fact
    * table per refresh and touching only the delta: merge cost is
    * O(|stored keys| + |delta|), independent of history size. */
  def mergeAggIncrement(baseAgg: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String], cacheKey: String): DataFrame = {
    val spark = baseAgg.sparkSession
    val dir = partitionedDirs.getOrElseUpdate(s"incr:$cacheKey", {
      val d = partitionedRoot.resolve(
        "incr_" + java.lang.Integer.toHexString(cacheKey.hashCode)).toString
      baseAgg.write.mode("overwrite").parquet(d)
      d
    })
    val stored = spark.read.parquet(dir)
    val counterCols = stored.columns.filterNot(keys.contains)
    stored.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(counterCols.head)).as(counterCols.head),
        counterCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  private val partitionedDirs = scala.collection.concurrent.TrieMap[String, String]()
  private lazy val partitionedRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-part")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }
  private def deleteRec(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Hive-partitioned layout + read-back: write `df` partitioned by
    * `partCol` (once per `cacheKey` per JVM, under one shutdown-cleaned
    * temp root) and return a reader over the layout. A filter on
    * `partCol` against the returned frame is answered from the
    * DIRECTORY LISTING alone — `PartitionFilters` in the scan, zero
    * non-matching files opened — which is the storage-side pruning a
    * 100 TB table lives or dies by (scan cost ∝ selected partitions,
    * not table size). */
  def partitionedView(df: DataFrame, cacheKey: String, partCol: String): DataFrame = {
    val spark = df.sparkSession
    val dir = partitionedDirs.getOrElseUpdate(s"$cacheKey/$partCol", {
      val p = partitionedRoot.resolve(
        java.lang.Integer.toHexString(s"$cacheKey/$partCol".hashCode))
      df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(p.toString)
      p.toString
    })
    spark.read.parquet(dir)
  }
}
