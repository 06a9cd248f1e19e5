package graft

import graft.ops.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SharedSpark {

  /** fake asset: "img " + width int32 BE + height int32 BE + payload */
  private def fakeImage(w: Int, h: Int, payload: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + payload)
    bb.put("img ".getBytes("US-ASCII"))
    bb.putInt(w)
    bb.putInt(h)
    bb.put(Array.fill(payload)(7.toByte))
    bb.array()
  }

  private def assets = df(
    "asset_id BIGINT, modality STRING, content BINARY, uri STRING",
    Seq(
      Row(1L, "image", fakeImage(640, 480, 100), null),
      Row(2L, "image", fakeImage(32, 32, 4), null),
      Row(3L, "image", Array[Byte](1, 2, 3), null), // too short to decode
      Row(4L, "image", null, null)
    )
  )

  test("filterDecodable drops null/short content") {
    assert(Multimodal.filterDecodable(assets).count() == 2)
  }

  test("decodeMetadata parses the stub header") {
    val meta = Multimodal.decodeMetadata(Multimodal.filterDecodable(assets))
      .select("asset_id", "metadata.mime", "metadata.width", "metadata.height", "metadata.ok")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)
    assert(meta == Seq((1L, "img", 640, 480, true), (2L, "img", 32, 32, true)))
  }

  test("extractFeatures emits fixed-dim deterministic vectors") {
    val f = Multimodal.extractFeatures(Multimodal.filterDecodable(assets), dim = 8)
    val rows = f.select("asset_id", "features").collect()
    rows.foreach(r => assert(r.getSeq[Float](1).size == 8))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(Multimodal.filterDecodable(assets), dim = 8)
      .select("asset_id", "features").collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("resize rewrites dimensions, shrinks payload, stays decodable") {
    val resized = Multimodal.resize(
      Multimodal.filterDecodable(assets), 320, 240)
    val meta = Multimodal.decodeMetadata(resized)
      .select(col("asset_id"), col("metadata.width"), col("metadata.height"),
        col("metadata.n_bytes"), col("metadata.ok"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // 640x480 → 320x240: quarter the pixels, payload 100 → 25
    assert(meta(1L) == ((320, 240, 12L + 25L, true)))
    // 32x32 upscale request is clamped (ratio capped at 1): payload kept
    assert(meta(2L) == ((320, 240, 12L + 4L, true)))
  }

  test("sampleFrames emits at most k frames covering the content") {
    val frames = Multimodal.sampleFrames(
      Multimodal.filterDecodable(assets), maxFrames = 4)
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byAsset(1L) == 4L)
    assert(byAsset(2L) == 4L)
    assert(frames.filter(col("frame").isNull).count() == 0)
  }
}
