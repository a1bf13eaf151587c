package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample pipeline stages a training-data pipeline needs.
  *
  * The actual codec work (JPEG decode, resampling, …) requires native
  * libraries not present in this container, so the byte→pixels step is a
  * clearly-marked DETERMINISTIC STUB (`stubDecode*`). Everything around it —
  * schema, null handling, batch shape, partitioning, the explode of frames,
  * the feature vector contract — is real Spark plumbing and is what matters
  * for the 100 TB design: media bytes never hit the driver, transforms are
  * per-partition, and metadata predicates prune before any decode.
  */
object Multimodal {

  /** Canonical media schema: content-addressed id + opaque payload + typed
    * metadata struct. Parquet stores the binary column page-compressed;
    * metadata predicates (format, width, …) push down without touching bytes.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap a raw binary column into the canonical layout, deriving fake-but-
    * deterministic metadata from the payload header. STUB: a real
    * implementation sniffs magic bytes; this hashes them. The header hash is
    * pluggable: the default is codegen'd xxhash64 (the fast path); oracle
    * queries pass a SQL-portable md5 leaf so an external engine can
    * reproduce the derived metadata bit-for-bit (the same portable-leaf
    * discipline as shingleHashesPortable).
    */
  def attachMeta(df: DataFrame, idCol: String, binCol: String,
                 headerHash: (Column, Int) => Column =
                   (h, k) => xxhash64(h, lit(k))): DataFrame = {
    val header = substring(col(binCol), 1, 16)
    def hh(k: Int) = headerHash(header, k)
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("media"),
      struct(
        element_at(array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4")),
          (pmod(hh(0), lit(4)) + 1).cast("int")).as("format"),
        (pmod(hh(1), lit(1920)) + 32).cast("int").as("width"),
        (pmod(hh(2), lit(1080)) + 32).cast("int").as("height"),
        pmod(hh(3), lit(600000)).as("duration_ms")
      ).as("meta"))
  }

  /** STUB decode → feature vector: a real pipeline decodes pixels and runs a
    * vision tower; this derives a deterministic `dim`-float vector from the
    * bytes so downstream stages (similarity, dedup, clustering) are fully
    * exercisable. Pure codegen'd expressions — per-row, no driver
    * involvement. The per-component hash is pluggable like
    * [[attachMeta]]'s: default xxhash64 (fast path); oracle queries pass a
    * SQL-portable md5 leaf so an external engine reproduces the features —
    * and therefore every downstream cosine — bit-for-bit (q_media_dedup's
    * regime).
    */
  def stubDecodeFeatures(media: Column, dim: Int,
                         hash: (Column, Column) => Column =
                           (m, i) => xxhash64(m, i)): Column =
    transform(sequence(lit(1), lit(dim)),
      i => (pmod(hash(media, i), lit(2000)).cast("double") - 1000.0) / 1000.0)

  /** STUB resize: real impl re-encodes pixels; this truncates/pads bytes to
    * the target size, keeping the (bytes → smaller bytes) contract and the
    * metadata update honest.
    */
  def stubResize(df: DataFrame, targetW: Int, targetH: Int): DataFrame =
    df.withColumn("media", substring(col("media"), 1, targetW * targetH / 64))
      .withColumn("meta", col("meta")
        .withField("width", lit(targetW))
        .withField("height", lit(targetH)))

  /** Frame sampling: one output row per sampled frame, evenly spaced over the
    * duration. The explode is the real shape (rows multiply by nFrames —
    * partition counts must account for it); the per-frame payload slice is
    * the STUB standing in for codec seek+decode.
    */
  def sampleFrames(df: DataFrame, nFrames: Int): DataFrame = {
    val frames = transform(sequence(lit(0), lit(nFrames - 1)), i =>
      struct(
        i.as("frame_idx"),
        (col("meta.duration_ms") * i / nFrames).as("ts_ms"),
        // STUB: a codec would seek to ts_ms and decode; we slice bytes
        substring(col("media"),
          (i * greatest(length(col("media")) / nFrames, lit(1)) + 1).cast("int"),
          lit(64)).as("frame_bytes")))
    df.select(col("media_id"), col("meta"), explode(frames).as("f"))
      .select(col("media_id"), col("meta"),
        col("f.frame_idx"), col("f.ts_ms"), col("f.frame_bytes"))
  }

  /** Batched feature extraction contract: partitions map to batches of
    * (id, bytes) pairs, features come back aligned by id. This is where a
    * real pipeline would call into a native/inference runtime per partition
    * (the Scala analogue of arrow-batched pandas UDFs) — the stub keeps the
    * iterator shape so swapping in a real codec is a one-function change.
    */
  def extractFeaturesBatched(df: DataFrame, dim: Int,
                             hash: (Column, Column) => Column =
                               (m, i) => xxhash64(m, i)): DataFrame =
    df.withColumn("features", stubDecodeFeatures(col("media"), dim, hash))
}
