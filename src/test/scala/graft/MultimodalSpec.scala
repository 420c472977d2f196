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
}
