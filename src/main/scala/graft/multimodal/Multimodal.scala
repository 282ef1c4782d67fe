package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature /
  * resize / frame-sample operators.
  *
  * The Spark-side architecture is real and tested — schemas, partition-wise
  * batch execution via `mapPartitions` (the JVM analogue of a Python
  * `mapInPandas` batch UDF: one iterator per partition, amortized per-batch
  * setup, no per-row driver involvement). The actual codecs are STUBBED
  * (this container ships no imaging/audio libraries): [[StubCodec]] derives
  * deterministic pseudo-metadata and pseudo-features from the bytes alone.
  * Swapping in a real decoder = replacing StubCodec, nothing else moves.
  */
object Multimodal {

  /** media row: content + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("media_type", StringType),     // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("size_bytes", LongType))))))

  /** Deterministic stand-in for a real decoder: every quantity is a pure
    * function of the bytes (so tests are exact and re-runs identical).
    * A real implementation would decode headers/pixels here. */
  object StubCodec {
    def format(bytes: Array[Byte]): String =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I') "wav"
      else "bin"

    def dims(bytes: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      (64 + math.abs(h % 193), 64 + math.abs((h / 193) % 129))
    }

    /** Fixed-dim pseudo-embedding: L1-normalized 16-bin byte histogram. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) / 16) += 1f; i += 1 }
      val n = math.max(1, bytes.length).toFloat
      hist.map(_ / n)
    }

    /** "Resize": deterministic byte subsample to ~targetBytes. */
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
      if (bytes.length <= targetBytes) bytes
      else {
        val step = bytes.length.toDouble / targetBytes
        Array.tabulate(targetBytes)(k => bytes((k * step).toInt))
      }
    }

    /** "Frame sample": n deterministic equal-stride slices of the bytes. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) Seq.empty
      else {
        val sz = math.max(1, bytes.length / math.max(1, n))
        (0 until n).map { k =>
          val from = math.min(k * sz, bytes.length - 1)
          java.util.Arrays.copyOfRange(bytes, from, math.min(from + sz, bytes.length))
        }
      }
    }
  }

  /** Wrap raw binary rows (from a binaryFile scan) into the media schema,
    * decoding metadata partition-wise. Header facts (JPEG/PNG dims, WAV
    * format) are REAL ([[MediaHeaders]]); only unrecognized formats fall
    * back to the stub's pseudo-dims. */
  def decode(binary: DataFrame, mediaType: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val pathIdx = binary.schema.fieldIndex("path")
    val contentIdx = binary.schema.fieldIndex("content")
    binary.mapPartitions { rows =>
      // per-partition (batch) scope: a real codec would init native context here
      rows.map { r =>
        val path = r.getString(pathIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val meta = MediaHeaders.imageDims(bytes) match {
          case Some(d) => Row(d.format, d.width, d.height, 1, bytes.length.toLong)
          case None => MediaHeaders.wavMeta(bytes) match {
            case Some(a) =>
              Row("wav", a.channels, a.sampleRate,
                math.max(1, a.durationSec.toInt), bytes.length.toLong)
            case None =>
              val (w, h) = StubCodec.dims(bytes)
              Row(StubCodec.format(bytes), w, h,
                if (mediaType == "video")
                  1 + math.abs(java.util.Arrays.hashCode(bytes) % 30)
                else 1,
                bytes.length.toLong)
          }
        }
        Row(path, mediaType, bytes, meta)
      }
    }(enc)
  }

  /** Feature extraction: media rows → (path, embedding array<float>). The
    * embedding column is directly consumable by [[graft.ops.Similarity]]. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pathIdx = media.schema.fieldIndex("path")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getString(pathIdx), StubCodec.features(r.getAs[Array[Byte]](contentIdx)))
      }
    }(enc)
  }

  /** Video frame sampling: one output row per sampled frame (path, frame_idx,
    * frame bytes) — the generator shape of a real frame extractor. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pathIdx = media.schema.fieldIndex("path")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        StubCodec.sampleFrames(r.getAs[Array[Byte]](contentIdx), n)
          .zipWithIndex.map { case (f, i) => Row(r.getString(pathIdx), i, f) }
      }
    }(enc)
  }
}
