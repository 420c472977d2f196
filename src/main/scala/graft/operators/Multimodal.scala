package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal (image/audio/video) column handling.
  *
  * Media lives in the engine as opaque `binary` columns plus a typed
  * metadata struct — the schema a 100 TB multimodal training pipeline
  * uses (content-addressed blobs in parquet, metadata queryable without
  * touching the bytes). Decode/feature-extract run as `mapPartitions`
  * over typed Datasets: per-partition batched, executor-local, no
  * driver round-trips, and the decoder is pluggable.
  *
  * THE ACTUAL CODECS ARE STUBS — this container ships no image/audio
  * libraries. [[FakeDecoder]] is a deterministic stand-in that preserves
  * the real contract (bytes → fixed-shape feature vector); swapping in a
  * JNI/JavaCV decoder changes one function, not the pipeline. The
  * Spark-side plumbing (schema, partitioning, batch shape, typed
  * encoders) is real and covered by MultimodalSpec.
  */
object Multimodal {

  /** Typed metadata carried next to the blob. */
  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  case class MediaAsset(asset_id: Long, kind: String, media: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, distinct_bytes: Int, embedding: Array[Float])

  /** Decoder contract: opaque bytes → fixed-dim feature vector. */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(kind: String, bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decoder: 8-dim byte-histogram projection. A real
    * implementation would JPEG/PCM-decode here; the call shape (one
    * invocation per asset, executor-side, no allocation amortized across
    * the partition iterator) is identical. */
  object FakeDecoder extends Decoder {
    val dim = 8
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { out((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val n = math.max(bytes.length, 1).toFloat
      var j = 0
      while (j < dim) { out(j) /= n; j += 1 }
      out
    }
  }

  /** The second, REAL decoder proving the plug-point: parses the
    * uncompressed 24-bpp Windows BMP container (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, bottom-up rows, 4-byte row alignment) with pure
    * JVM code — the one raster format decodable without native libs.
    * Features: [width, height, bpp, meanBlue, meanGreen, meanRed,
    * valid-flag, pixelCount]. Malformed input yields the all-zero
    * vector instead of throwing: a 100 TB decode job must quarantine
    * bad blobs, not die on the first one. Swapping FakeDecoder for this
    * changes ONE argument of [[extractFeatures]]; MultimodalSpec runs
    * both through the identical pipeline and plan. */
  object BmpDecoder extends Decoder {
    val dim = 8
    val HeaderBytes = 54
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes.length < HeaderBytes || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
        return out
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataOffset = buf.getInt(10)
      val width = buf.getInt(18)
      val height = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      // Long row math: width*3 wraps Int for widths > 715M, which would
      // slip a bogus tiny rowBytes past the bounds guard and crash the
      // pixel loop instead of quarantining (the blob can't hold the
      // claimed pixels anyway — the Long comparison rejects it)
      val rowBytes = ((width.toLong * 3 + 3) / 4) * 4
      if (bpp != 24 || width <= 0 || height <= 0 || dataOffset < HeaderBytes ||
        dataOffset.toLong + rowBytes * height > bytes.length) return out
      var sb = 0L; var sg = 0L; var sr = 0L
      var y = 0
      while (y < height) {
        // safe narrowing: the guard proved dataOffset + rowBytes*height
        // fits in the (Int-length) array
        val base = (dataOffset + y * rowBytes).toInt
        var x = 0
        while (x < width) {
          sb += bytes(base + 3 * x) & 0xff
          sg += bytes(base + 3 * x + 1) & 0xff
          sr += bytes(base + 3 * x + 2) & 0xff
          x += 1
        }
        y += 1
      }
      val n = width.toLong * height
      out(0) = width.toFloat; out(1) = height.toFloat; out(2) = bpp.toFloat
      out(3) = sb.toFloat / n; out(4) = sg.toFloat / n; out(5) = sr.toFloat / n
      out(6) = 1f; out(7) = n.toFloat
      out
    }
  }

  /** Synthesize a media-asset Dataset from `documents` (deterministic:
    * the blob is the UTF-8 text — a stand-in for real image bytes). */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaAsset(id, kind, bytes, MediaMeta(s"fake/$kind", 64, 64, bytes.length.toLong))
      }
  }

  /** Decode + feature-extract: mapPartitions so a real decoder can
    * amortize native-context setup per partition, not per row. */
  def extractFeatures(ds: Dataset[MediaAsset], decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { a =>
        val emb = decoder.decode(a.kind, a.media)
        var sum = 0L
        val seen = new java.util.BitSet(256)
        a.media.foreach { b => sum += (b & 0xff); seen.set(b & 0xff) }
        MediaFeatures(a.asset_id, a.kind, a.media.length.toLong,
          if (a.media.isEmpty) 0.0 else sum.toDouble / a.media.length,
          seen.cardinality(), emb)
      }
    }
  }

  /** Resize stub: rewrites metadata and truncates the blob — the real
    * version re-encodes; the pipeline shape (binary→binary map) is the
    * same. */
  def resize(ds: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import ds.sparkSession.implicits._
    ds.map { a =>
      // multiply before dividing: integer division of the ratio would
      // truncate every downscale to scale 0 (→ 1-byte blobs)
      val origArea = math.max(a.meta.width.toLong * a.meta.height, 1L)
      val scaled = a.media.length.toLong * w * h / origArea
      val n = math.max(1, math.min(a.media.length.toLong, scaled)).toInt
      a.copy(media = a.media.take(n), meta = a.meta.copy(width = w, height = h, nBytes = n.toLong))
    }
  }

  /** Frame sampling for `video` assets: every `stride`-th 16-byte chunk
    * becomes a "frame" row — the explode shape of real frame extraction. */
  def sampleFrames(ds: Dataset[MediaAsset], stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video")
      .flatMap { a =>
        a.media.grouped(16).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) => (a.asset_id, idx, chunk) }
      }
      .toDF("asset_id", "frame_idx", "frame_bytes")
  }

  /** m01 — feature extraction over the synthesized asset table. The
    * embedding column is dropped from the query result (float formatting
    * is not oracle-comparable); its shape is asserted by MultimodalSpec.
    * No oracleSql entry: mapPartitions decode is not SQL-expressible, so
    * the driver records the weaker rows-only check by design. */
  def m01MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(spark, dir)).toDF()
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        round(col("mean_byte"), 4).as("mean_byte"), col("distinct_bytes"))
      .orderBy(col("asset_id").asc)

  /** m02 — frame sampling rollup: frames per video asset at stride 4. */
  def m02FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(assets(spark, dir), stride = 4)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("sampled_bytes"))
      .orderBy(col("asset_id").asc)

  /** m03 — modality mixture card: per media kind, asset/byte totals and
    * each kind's share of the corpus bytes — the p04 mixing decision at
    * the modality grain (how much of the training budget is image vs
    * audio vs video bytes). One map-combinable aggregate over the typed
    * asset Dataset (3 groups); the corpus byte total rejoins as a
    * broadcast scalar (S8 in-plan pattern). Exact BIGINT sums; the two
    * ratios divide once at the end (t02 contract). */
  def m03ModalityCard(spark: SparkSession, dir: String): DataFrame = {
    val perKind = assets(spark, dir).toDF()
      .select(col("kind"), col("meta.nBytes").as("n_bytes"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"), sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"), max(col("n_bytes")).as("max_bytes"))
    val tot = perKind.agg(sum(col("total_bytes")).as("corpus_bytes"))
    perKind.crossJoin(broadcast(tot))
      .select(col("kind"), col("n_assets"), col("total_bytes"),
        col("min_bytes"), col("max_bytes"),
        (col("total_bytes").cast("double") / col("n_assets")).as("mean_bytes"),
        (col("total_bytes").cast("double") / col("corpus_bytes")).as("bytes_share"))
      .orderBy(col("kind").asc)
  }

  /** m04 — content-addressed cross-modal dedup: hash the BLOB, group by
    * the digest — the dedup a content-addressed media store runs before
    * ever decoding anything, and the only one that catches the same
    * bytes uploaded under two different modality labels (an "image" and
    * a "video" poster frame with identical content). The corpus has no
    * natural cross-modal reupload, so (d13 pattern) the query runs over
    * a deterministically AUGMENTED view: docs with doc_id % 19 == 0 get
    * a second asset at the provably disjoint id -doc_id-1, whose
    * id-derived kind differs — every emitted group is a cross-modal
    * catch, and the keeper is the smallest ORIGINAL id (synthetics live
    * at negative ids; d13's min-over-non-negatives rule). Scale: one
    * map-combinable hash aggregate over digests — the d01 plan on the
    * binary column, with the blob reduced to 16 bytes map-side. */
  /** Content-addressed dedup core over ANY (asset_id, kind,
    * media: binary) frame — operates on the input AS GIVEN (no synthetic
    * rows; the fixture augmentation lives in the m04 wrapper). Contract:
    * ids < 0 are reserved for synthetic/staging rows and never chosen as
    * keeper (d13's rule). The blob reduces to a 16-byte digest map-side,
    * so the shuffle carries digests, never media bytes. */
  def contentDedup(assetFrame: DataFrame): DataFrame =
    assetFrame
      .select(col("asset_id"), col("kind"), md5(col("media")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_assets"),
        countDistinct(col("kind")).as("n_kinds"),
        concat_ws(",", sort_array(collect_set(col("kind")))).as("kinds"),
        min(when(col("asset_id") >= 0, col("asset_id"))).as("keep_asset_id"))
      .where(col("n_assets") > 1)
      .orderBy(col("keep_asset_id").asc)

  /** Fixture wrapper: the corpus has no natural cross-modal reupload, so
    * docs with doc_id % 19 == 0 get a second asset at the disjoint id
    * -doc_id-1 whose id-derived kind differs. Augmentation is TEST DATA
    * — it lives here, not in [[contentDedup]]. */
  def m04ContentDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val aug = docs.unionAll(docs.where(col("doc_id") % 19 === 0)
      .select((-col("doc_id") - 1L).as("doc_id"), col("text")))
    contentDedup(aug.select(col("doc_id").as("asset_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END").as("kind"),
      encode(col("text"), "UTF-8").as("media")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m04_content_dedup" -> m04ContentDedup _,
    "m03_modality_card" -> m03ModalityCard _,
    "m01_media_features" -> m01MediaFeatures _,
    "m02_frame_sample" -> m02FrameSample _
  )

  /** Full oracles despite the mapPartitions path: the fake blob is the
    * UTF-8 bytes of (ASCII) text, so byte statistics and chunk counts
    * reduce to SQL over character codes — DuckDB recomputes what the
    * typed-Dataset pipeline produced, end to end. */
  val oracleSql: Map[String, String] = Map(
    "m04_content_dedup" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT -doc_id - 1, text FROM documents WHERE doc_id % 19 = 0),
        |a AS (
        |  SELECT doc_id AS asset_id,
        |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         md5(text) AS content_hash
        |  FROM aug)
        |SELECT content_hash, count(*) AS n_assets,
        |       count(DISTINCT kind) AS n_kinds,
        |       string_agg(DISTINCT kind, ',' ORDER BY kind) AS kinds,
        |       min(CASE WHEN asset_id >= 0 THEN asset_id END) AS keep_asset_id
        |FROM a
        |GROUP BY 1
        |HAVING count(*) > 1
        |ORDER BY keep_asset_id ASC NULLS FIRST""".stripMargin,

    "m03_modality_card" ->
      """WITH a AS (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |k AS (
        |  SELECT kind, count(*) AS n_assets,
        |         CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |         min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
        |  FROM a GROUP BY 1),
        |t AS (SELECT CAST(sum(total_bytes) AS BIGINT) AS corpus_bytes FROM k)
        |SELECT kind, n_assets, total_bytes, min_bytes, max_bytes,
        |       CAST(total_bytes AS DOUBLE) / n_assets AS mean_bytes,
        |       CAST(total_bytes AS DOUBLE) / corpus_bytes AS bytes_share
        |FROM k CROSS JOIN t
        |ORDER BY kind ASC NULLS FIRST""".stripMargin,

    "m01_media_features" ->
      """WITH bytes AS (
        |  SELECT doc_id, ascii(substring(text, i, 1)) AS b
        |  FROM documents, unnest(generate_series(1, length(text))) AS t(i))
        |SELECT doc_id AS asset_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       octet_length(encode(d.text)) AS n_bytes,
        |       CASE WHEN count(b) = 0 THEN 0.0
        |            ELSE round(CAST(sum(b) AS DOUBLE) / count(b), 4) END AS mean_byte,
        |       CAST(count(DISTINCT b) AS INTEGER) AS distinct_bytes
        |FROM documents d LEFT JOIN bytes USING (doc_id)
        |GROUP BY doc_id, d.text
        |ORDER BY asset_id ASC NULLS FIRST""".stripMargin,

    "m02_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |         CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_chunks
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, len, n_chunks,
        |         (n_chunks - 1) // 4 + 1 AS n_frames
        |  FROM v WHERE len > 0)
        |SELECT doc_id AS asset_id, n_frames,
        |       CAST(16 * (n_frames - 1) +
        |            CASE WHEN 4 * (n_frames - 1) = n_chunks - 1
        |                 THEN len - 16 * (n_chunks - 1) ELSE 16 END AS BIGINT)
        |         AS sampled_bytes
        |FROM f
        |ORDER BY asset_id ASC NULLS FIRST""".stripMargin
  )
}
