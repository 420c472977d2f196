package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** Multimodal plumbing: typed binary columns, mapPartitions decode,
  * resize/frame-sample shapes. The decoder is the deterministic fake —
  * these tests pin the pipeline contract, not codec output. */
class MultimodalSpec extends SparkSpec {

  test("assets synthesize with typed metadata and stable kinds") {
    val a = assets(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { x =>
      assert(x.meta.nBytes === x.media.length.toLong)
      assert(Set("image", "audio", "video").contains(x.kind))
      assert(x.kind === Seq("image", "audio", "video")((x.asset_id % 3).toInt))
    }
  }

  test("feature extraction emits fixed-dim embeddings and exact byte stats") {
    val f = extractFeatures(assets(spark, sf)).collect()
    f.foreach { x =>
      assert(x.embedding.length === FakeDecoder.dim)
      if (x.n_bytes == 0) { // empty media is a supported input
        assert(x.embedding.forall(_ === 0f) && x.distinct_bytes === 0 && x.mean_byte === 0.0)
      } else {
        assert(math.abs(x.embedding.sum - 1.0f) < 1e-3, "histogram must normalize")
        assert(x.distinct_bytes > 0 && x.distinct_bytes <= 256)
      }
    }
  }

  test("decode is deterministic across partitionings") {
    val ds = assets(spark, sf)
    val one = extractFeatures(ds.repartition(1)).collect().map(f => f.asset_id -> f.mean_byte).toMap
    val many = extractFeatures(ds.repartition(7)).collect().map(f => f.asset_id -> f.mean_byte).toMap
    assert(one === many)
  }

  test("resize truncates bytes and rewrites metadata") {
    val r = resize(assets(spark, sf), 8, 8).collect()
    r.foreach { x =>
      assert(x.meta.width === 8 && x.meta.height === 8)
      assert(x.media.length.toLong === x.meta.nBytes)
    }
  }

  test("resize scales byte budget proportionally to the area ratio") {
    val orig = assets(spark, sf).collect().map(a => a.asset_id -> a.media.length).toMap
    // 64x64 → 32x32 = quarter area → ~quarter of the bytes (not 1 byte:
    // the integer-division regression truncated every downscale ratio to 0)
    resize(assets(spark, sf), 32, 32).collect().foreach { x =>
      val expected = math.max(1, orig(x.asset_id) / 4)
      assert(x.media.length === expected,
        s"asset ${x.asset_id}: ${x.media.length} != $expected of ${orig(x.asset_id)}")
    }
  }

  test("frame sampling keeps every stride-th chunk of video assets only") {
    val frames = sampleFrames(assets(spark, sf), stride = 4).collect()
    assert(frames.nonEmpty)
    frames.foreach { row =>
      assert(row.getLong(0) % 3 === 2L, "only video assets")
      assert(row.getInt(1) % 4 === 0, "stride respected")
    }
  }

  test("m01/m02 query entries return rows") {
    assert(Multimodal.m01MediaFeatures(spark, sf).count() > 0)
    assert(Multimodal.m02FrameSample(spark, sf).count() > 0)
  }

  /** Encode a bottom-up 24-bpp BMP the way any real writer does (54-byte
    * header + 4-byte-aligned rows), so BmpDecoder is exercised against
    * genuine container bytes, not its own assumptions. */
  private def bmp(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- 0 until h; x <- 0 until w) {
      val y = h - 1 - row // bottom-up storage: file row 0 is image bottom
      val (r, g, b) = px(x, y)
      buf.position(54 + row * rowBytes + 3 * x)
      buf.put(b.toByte).put(g.toByte).put(r.toByte)
    }
    buf.array()
  }

  test("the Decoder plug-point: a second, real decoder (BMP parse) through the same pipeline") {
    import spark.implicits._
    val red = bmp(4, 2)((_, _) => (255, 0, 0))
    val grad = bmp(5, 3)((x, y) => (10 * x, 20 * y, 7))
    val ds = Seq(
      MediaAsset(1L, "image", red, MediaMeta("image/bmp", 4, 2, red.length.toLong)),
      MediaAsset(2L, "image", grad, MediaMeta("image/bmp", 5, 3, grad.length.toLong)),
      MediaAsset(3L, "image", "not a bmp".getBytes, MediaMeta("image/bmp", 0, 0, 9L))).toDS()
    val real = extractFeatures(ds, BmpDecoder).collect().map(f => f.asset_id -> f).toMap
    // asset 1: solid red 4x2 — exact header fields and channel means
    assert(real(1L).embedding.toSeq === Seq[Float](4f, 2f, 24f, 0f, 0f, 255f, 1f, 8f))
    // asset 2: means over the gradient, exact integer arithmetic
    val n = 5 * 3
    val meanR = (0 until 5).map(10 * _).sum * 3f / n
    val meanG = (0 until 3).map(20 * _).sum * 5f / n
    assert(real(2L).embedding.toSeq === Seq[Float](5f, 3f, 24f, 7f, meanG, meanR, 1f, n.toFloat))
    // asset 3: malformed input quarantines to the zero vector, no throw
    assert(real(3L).embedding.forall(_ === 0f))
    // adversarial header: width large enough that width*3 wraps Int to a
    // tiny rowBytes — must quarantine (Long row math), not AIOOBE
    val evil = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
    evil.putInt(40).putInt(0x55555556).putInt(1).putShort(1).putShort(24).putInt(0)
    assert(BmpDecoder.decode("image", evil.array()).forall(_ === 0f),
      "overflowing width must be rejected by the bounds guard")
    // the byte stats come from the shared pipeline, decoder-independent
    assert(real(1L).n_bytes === red.length.toLong)
    // same bytes through the FAKE decoder: identical pipeline, different
    // features — proving extractFeatures is decoder-parametric
    val fake = extractFeatures(ds, FakeDecoder).collect().map(f => f.asset_id -> f).toMap
    assert(fake(1L).embedding.toSeq !== real(1L).embedding.toSeq)
    assert(fake(1L).n_bytes === real(1L).n_bytes && fake(1L).mean_byte === real(1L).mean_byte)
    // and an identical optimized plan shape (one mapPartitions pipeline)
    def shape(d: org.apache.spark.sql.Dataset[_]): Seq[String] =
      d.queryExecution.optimizedPlan.collect { case p => p.nodeName }
    assert(shape(extractFeatures(ds, BmpDecoder)) === shape(extractFeatures(ds, FakeDecoder)))
  }

  test("m04 content dedup: every reupload group caught, keeper is the original, kinds differ") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // texts duplicated naturally OR via the %19 reupload — group by text
    val augIds = docs.flatMap { case (id, t) =>
      if (id % 19 == 0) Seq((t, id), (t, -id - 1)) else Seq((t, id))
    }.groupBy(_._1).values.filter(_.size > 1).toSeq
    val rows = Multimodal.m04ContentDedup(spark, sf).collect()
    assert(rows.length === augIds.size, "one group per duplicated blob")
    val byKeep = rows.map(r => r.getAs[Long]("keep_asset_id") -> r).toMap
    augIds.foreach { grp =>
      val ids = grp.map(_._2)
      val keep = ids.filter(_ >= 0).min
      val r = byKeep(keep)
      assert(r.getAs[Long]("n_assets") === ids.size.toLong)
      def kind(id: Long) = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val kinds = ids.map(kind).distinct.sorted
      assert(r.getAs[Long]("n_kinds") === kinds.size.toLong)
      assert(r.getAs[String]("kinds") === kinds.mkString(","))
    }
    // the operator's point: at least one group is genuinely CROSS-modal
    assert(rows.exists(_.getAs[Long]("n_kinds") > 1L), "no cross-modal dup caught")
  }
}
