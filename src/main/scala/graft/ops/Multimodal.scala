package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` content columns + typed metadata, processed
  * in partition-sized batches.
  *
  * The Spark side — schema convention, partitioning, batch iteration,
  * output shapes — is real and tested. The codec kernels themselves
  * (JPEG/PNG/audio decode) are STUBBED with a deterministic header parser
  * (`decodeStub`), because no image/audio libraries ship in this
  * environment; swap `decodeStub` for a real codec (e.g. TwelveMonkeys /
  * javax.imageio) without touching the plumbing.
  */
object Multimodal {

  /** Canonical asset schema: id, modality tag, raw bytes, source URI. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("uri", StringType, nullable = true)
  ))

  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false)
  ))

  /** STUB decode kernel: reads a fake 12-byte header
    * [mime tag: 4 ASCII bytes][width: int32 BE][height: int32 BE].
    * Deterministic so specs can assert on it; replace with a real codec in
    * production.
    */
  private[ops] def decodeStub(content: Array[Byte]): Row = {
    if (content == null || content.length < 12)
      Row(null, null, null, if (content == null) 0L else content.length.toLong, false)
    else {
      val mime = new String(content.slice(0, 4), "US-ASCII").trim
      def int32(off: Int): Int =
        ((content(off) & 0xff) << 24) | ((content(off + 1) & 0xff) << 16) |
          ((content(off + 2) & 0xff) << 8) | (content(off + 3) & 0xff)
      Row(mime, int32(4), int32(8), content.length.toLong, true)
    }
  }

  /** Decode pass: one partition-local batch loop (the JVM analog of a
    * pandas-batched UDF) appending a typed metadata struct. No shuffle.
    */
  def decodeMetadata(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("metadata", metadataType, nullable = false))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val content = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeStub(content))
      }
    }(Encoders.row(outSchema))
  }

  /** STUB feature extraction: fixed-size float vector derived
    * deterministically from content bytes (stand-in for an image/audio
    * embedding model). Batch-shaped like `mapInPandas`: partition-local,
    * no shuffle, vector column ready for [[Similarity]] ops.
    */
  def extractFeatures(
      df: DataFrame,
      contentCol: String = "content",
      dim: Int = 16
  ): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), true))
    val idx = df.schema.fieldIndex(contentCol)
    val d = dim
    df.mapPartitions { rows =>
      rows.map { r =>
        val content = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val feats: Seq[Float] =
          if (content == null) null
          else {
            val out = new Array[Float](d)
            var i = 0
            while (i < content.length) {
              out(i % d) += (content(i) & 0xff) / 255.0f
              i += 1
            }
            out.toSeq
          }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Image resize plumbing: rewrites the content header to the target
    * dimensions and downsamples the payload proportionally to the pixel
    * ratio. STUB kernel (a real implementation would decode, interpolate and
    * re-encode); the Spark shape — narrow partition-local pass, binary in /
    * binary out, metadata consistent with a subsequent [[decodeMetadata]] —
    * is the real contract.
    */
  def resize(
      df: DataFrame,
      targetWidth: Int,
      targetHeight: Int,
      contentCol: String = "content"
  ): DataFrame = {
    require(targetWidth > 0 && targetHeight > 0)
    val idx = df.schema.fieldIndex(contentCol)
    val (tw, th) = (targetWidth, targetHeight)
    val outSchema = StructType(df.schema.fields)
    df.mapPartitions { rows =>
      rows.map { r =>
        val content = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val resized: Array[Byte] =
          if (content == null || content.length < 12) content
          else {
            def int32(off: Int): Int =
              ((content(off) & 0xff) << 24) | ((content(off + 1) & 0xff) << 16) |
                ((content(off + 2) & 0xff) << 8) | (content(off + 3) & 0xff)
            val (w, h) = (int32(4), int32(8))
            val srcPixels = math.max(w.toLong * h.toLong, 1L)
            val ratio = math.min(1.0, (tw.toLong * th.toLong).toDouble / srcPixels)
            val payload = content.length - 12
            val newPayload = math.max((payload * ratio).toInt, 0)
            val out = new Array[Byte](12 + newPayload)
            System.arraycopy(content, 0, out, 0, 4) // mime tag
            def putInt32(off: Int, v: Int): Unit = {
              out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
              out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
            }
            putInt32(4, tw); putInt32(8, th)
            // deterministic stride sampling of the payload (stub for real
            // interpolation)
            if (newPayload > 0) {
              val step = payload.toDouble / newPayload
              var i = 0
              while (i < newPayload) {
                out(12 + i) = content(12 + math.min((i * step).toInt, payload - 1))
                i += 1
              }
            }
            out
          }
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(Encoders.row(outSchema))
  }

  /** Video frame sampling plumbing: emits ≤ maxFrames (asset_id, frame_idx,
    * frame_bytes) rows per asset. The STUB "decoder" slices the content
    * into equal chunks; a real implementation would seek keyframes.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String = "asset_id",
      contentCol: String = "content",
      maxFrames: Int = 4
  ): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)
    ))
    val idIdx = df.schema.fieldIndex(idCol)
    val cIdx = df.schema.fieldIndex(contentCol)
    val k = maxFrames
    df.flatMap { r =>
      val id = r.getLong(idIdx)
      val content = if (r.isNullAt(cIdx)) null else r.getAs[Array[Byte]](cIdx)
      if (content == null || content.isEmpty) Iterator.empty
      else {
        val n = math.min(k, content.length)
        val step = math.max(content.length / n, 1)
        (0 until n).iterator.map { i =>
          Row(id, i, content.slice(i * step, math.min((i + 1) * step, content.length)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Size/validity filter used before expensive decode stages: pushes down
    * to the scan (length(binary) is a cheap codegen'd expression).
    */
  def filterDecodable(
      df: DataFrame,
      contentCol: String = "content",
      minBytes: Int = 12,
      maxBytes: Long = 64L * 1024 * 1024
  ): DataFrame =
    df.filter(
      col(contentCol).isNotNull &&
        length(col(contentCol)) >= minBytes &&
        length(col(contentCol)) <= maxBytes
    )
}
