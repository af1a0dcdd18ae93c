package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata structs.
  *
  * The decode step is a STUB — image/audio codecs are not available in
  * this environment, so `media` is a deterministic fake (the UTF-8 bytes
  * of the text column) and "decode" derives metadata arithmetically.
  * Everything around the stub is real Spark plumbing: binary columns,
  * metadata structs, slicing (resize), frame sampling into
  * `array<binary>`, and content hashing — all native expressions, no
  * UDFs, so a real decoder can later slot in as a Catalyst Expression
  * or mapPartitions batch without changing any schema.
  */
object Multimodal {

  /** Real file ingest: a directory of media files through Spark's
    * `binaryFile` source into the SAME media/meta schema the stub
    * pipeline uses, so [[decodeBatched]] / [[metaExtract]]-style
    * consumers run unchanged on actual files. The source gives
    * distributed reads, partition pruning on path, and
    * `pathGlobFilter` format selection for free; width/height stay null
    * until a decoder fills them (codecs are not available here).
    * doc_id is the path hash — deterministic across re-ingests. */
  def ingestBinary(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("path"),
        col("content").as("media"),
        struct(
          col("length").as("byte_len"),
          regexp_extract(col("path"), "\\.([^.]+)$", 1).as("format"),
          lit(null).cast("long").as("width"),
          lit(null).cast("long").as("height")).as("meta"))

  /** Attach a fake media binary + typed metadata struct. */
  def withMedia(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        octet_length(col("media")).as("byte_len"),
        lit("fake/raw").as("format"),
        (col("n_chars") % 640).cast("long").as("width"),
        (col("n_chars") % 480).cast("long").as("height")))

  /** Metadata + content-hash extraction (the "decode" stub's output). */
  def metaExtract(docs: DataFrame): DataFrame =
    withMedia(docs).select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      md5(col("media")).as("h"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))

  /** Batched decode integration point — the Scala analog of a batched
    * pandas UDF: mapPartitions hands the decoder a whole partition
    * iterator, so expensive per-task init (codec context, model weights)
    * is paid once per partition, not per row, and rows stream through
    * without materializing the partition. The default decoder is the
    * deterministic stub (`???`-equivalent: byte-length arithmetic in
    * place of a real codec); a real decoder replaces the function
    * without touching schema or partitioning. */
  def decodeBatched(docs: DataFrame,
      decode: Array[Byte] => (Long, Long) = stubDecode): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // accept both shapes: already-ingested media (binaryFile path) or
    // raw documents that still need the stub attachment
    val withM = if (docs.columns.contains("media")) docs else withMedia(docs)
    withM
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (once), before the row loop
        it.map { case (id, bytes) =>
          val (w, h) = decode(bytes)
          (id, w, h)
        }
      }
      .toDF("doc_id", "dec_width", "dec_height")
  }

  /** Stand-in for a codec: derives dimensions from the payload bytes. */
  private def stubDecode(bytes: Array[Byte]): (Long, Long) =
    (bytes.length.toLong % 640, bytes.length.toLong % 480)

  /** "Resize": proportional byte-slice of the media payload. A real
    * implementation replaces the slice with a codec call; the schema and
    * partition behavior stay identical. */
  def resizeStub(docs: DataFrame, fraction: Double): DataFrame =
    withMedia(docs).select(
      col("doc_id"),
      expr(s"substring(media, 1, CAST(octet_length(media) * $fraction AS INT))").as("media_small"))

  /** "Frame sampling": split the payload into n equal byte slices, one
    * row per (doc, frame). A real video pipeline swaps the byte slice
    * for a codec frame grab; the explode shape and schema stay. */
  def frameSample(docs: DataFrame, nFrames: Int): DataFrame =
    withMedia(docs)
      .withColumn("flen",
        greatest((octet_length(col("media")) / nFrames).cast("int"), lit(1)))
      .select(col("doc_id"), col("media"), col("flen"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        expr("substring(media, frame_no * flen + 1, flen)").as("frame"))
}
