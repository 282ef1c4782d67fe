package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature /
  * resize / frame-sample operators.
  *
  * Partition-wise batch execution via `mapPartitions` (the JVM analogue of a
  * Python `mapInPandas` batch UDF: one iterator per partition, amortized
  * per-batch setup, no per-row driver involvement). Decode is REAL:
  * [[ImageCodec]] (javax.imageio — JPEG/PNG/BMP/GIF/TIFF, headless) for
  * pixels and [[AudioCodec]] (pure-JVM RIFF/PCM) for waveforms;
  * [[MediaHeaders]] stays as the cheap header-only metadata path. Only
  * formats with no JDK decoder (video containers, compressed audio) fall
  * back to [[StubCodec]]'s deterministic byte-level pseudo-features, so
  * opaque blobs still flow through the pipeline with stable fingerprints.
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

  /** Deterministic byte-level fallback for formats with no JDK decoder
    * (video containers, MP3/AAC/FLAC, arbitrary blobs): every quantity is a
    * pure function of the bytes, so undecodable media still get stable
    * fingerprints/pseudo-frames. Decodable images/audio never reach this —
    * see [[ImageCodec]] / [[AudioCodec]]. */
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
            case None => MediaHeaders.mp4Meta(bytes) match {
              case Some(v) =>
                // real container metadata: display dims + whole seconds of
                // duration in n_frames (frame count needs a codec the JDK
                // lacks; duration is the filter signal pipelines use)
                Row("mp4", v.width, v.height,
                  math.max(1, math.ceil(v.durationSec).toInt), bytes.length.toLong)
              case None => MediaHeaders.framedAudioMeta(bytes) match {
                case Some(fa) =>
                  // MP3/ADTS frame-header walk: real sample rate, channel
                  // count and frame count without any decoder
                  Row(fa.format, fa.channels, fa.sampleRate, fa.frames,
                    bytes.length.toLong)
                case None =>
                  val (w, h) = StubCodec.dims(bytes)
                  Row(StubCodec.format(bytes), w, h,
                    if (mediaType == "video")
                      1 + math.abs(java.util.Arrays.hashCode(bytes) % 30)
                    else 1,
                    bytes.length.toLong)
              }
            }
          }
        }
        Row(path, mediaType, bytes, meta)
      }
    }(enc)
  }

  /** Feature extraction: media rows → (path, embedding array<float>). The
    * embedding column is directly consumable by [[graft.ops.Similarity]].
    *
    * Real pixels first: bytes that decode as an image embed as their
    * L1-normalized 16-bin luminance histogram (a content feature — invariant
    * under re-encoding, unlike any function of the compressed bytes);
    * undecodable bytes fall back to the byte-histogram fingerprint. Both
    * paths emit the same 16-dim L1-normalized shape. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pathIdx = media.schema.fieldIndex("path")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val emb = ImageCodec.decode(bytes) match {
          case Some(d) => ImageCodec.lumaHistogram(d.img, bins = 16)
          case None    => StubCodec.features(bytes)
        }
        Row(r.getString(pathIdx), emb)
      }
    }(enc)
  }

  /** Full pixel decode: binary rows → per-image pixel facts. Width/height/
    * channels come from the decoded raster (not headers); channel sums are
    * exact longs over every pixel; aHash/dHash are 64-bit perceptual hashes
    * for image near-dup detection (join on small Hamming distance, or band
    * the 64 bits 16×4 for an LSH-style bucketed self-join — the same
    * pattern as [[graft.ops.Dedup.simHashPairs]]). Undecodable rows are
    * dropped (they carry no pixels; route them through [[decode]] for
    * byte-level metadata instead). */
  def decodePixels(binary: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("format", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pathIdx = binary.schema.fieldIndex("path")
    val contentIdx = binary.schema.fieldIndex("content")
    binary.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageCodec.decode(r.getAs[Array[Byte]](contentIdx)).map { d =>
          val (sr, sg, sb, n) = ImageCodec.channelSums(d.img)
          Row(r.getString(pathIdx), d.format, d.width, d.height, d.channels,
            n, sr, sg, sb, ImageCodec.aHash(d.img), ImageCodec.dHash(d.img))
        }
      }
    }(enc)
  }

  /** Real audio decode: binary rows → PCM waveform statistics (duration,
    * exact sample sum, peak, RMS, clipped fraction). Non-PCM/undecodable
    * rows are dropped. */
  def decodeAudio(binary: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("bits_per_sample", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_sec", DoubleType, nullable = false),
      StructField("sum_samples", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("clipped_pct", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pathIdx = binary.schema.fieldIndex("path")
    val contentIdx = binary.schema.fieldIndex("content")
    binary.mapPartitions { rows =>
      rows.flatMap { r =>
        AudioCodec.decode(r.getAs[Array[Byte]](contentIdx)).map { p =>
          val s = AudioCodec.stats(p)
          Row(r.getString(pathIdx), p.channels, p.sampleRate, p.bitsPerSample,
            s.nSamples, s.durationSec, s.sumSamples, s.peak, s.rms, s.clippedPct)
        }
      }
    }(enc)
  }

  /** Image near-duplicate pairs by perceptual hash: decode → dHash →
    * banded Hamming self-join ([[graft.ops.Dedup.hammingPairs]], perfect
    * recall at `maxHamming` via maxHamming+1 pigeonhole bands). Catches
    * re-encoded / re-compressed / lightly-edited copies whose BYTES differ
    * completely — the image analogue of MinHash text dedup, with the same
    * bucketed 100 TB shape (explode + one shuffle + capped buckets; decode
    * cost dominates and is row-local). Returns (patha, pathb, hamming). */
  def imageNearDupPairs(binary: DataFrame, maxHamming: Int = 5,
      maxBucketSize: Int = 1000): DataFrame = {
    graft.ops.Dedup.hammingPairs(imageSignatures(binary),
        "path", "dhash", maxHamming, maxBucketSize)
      .select(col("ida").as("patha"), col("idb").as("pathb"), col("hamming"))
  }

  /** dHash signatures only: decode + one 9×8 box resize per image. The
    * near-dup path needs nothing else — going through [[decodePixels]]
    * would add a full channel-stats raster pass and an aHash thumbnail
    * pass per image whose outputs are immediately discarded (~2× avoidable
    * pixel work at corpus scale). */
  private def imageSignatures(binary: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pathIdx = binary.schema.fieldIndex("path")
    val contentIdx = binary.schema.fieldIndex("content")
    binary.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageCodec.decode(r.getAs[Array[Byte]](contentIdx)).map { d =>
          Row(r.getString(pathIdx), ImageCodec.dHash(d.img))
        }
      }
    }(enc)
  }

  /** Real thumbnail generation: decode → deterministic box resize →
    * lossless PNG re-encode. The storage-reduction tier for image corpora
    * (the image analogue of [[graft.ops.Similarity]]'s int8 quantization).
    * Undecodable rows are dropped. */
  def resizeImages(binary: DataFrame, outW: Int, outH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("content", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pathIdx = binary.schema.fieldIndex("path")
    val contentIdx = binary.schema.fieldIndex("content")
    binary.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageCodec.decode(r.getAs[Array[Byte]](contentIdx)).map { d =>
          val small = ImageCodec.boxResize(d.img, outW, outH)
          Row(r.getString(pathIdx), outW, outH, ImageCodec.encode(small, "png"))
        }
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame (path, frame_idx,
    * frame bytes). REAL for every format the JDK decodes: min(n, frame
    * count) equal-stride frames are decoded and re-encoded as lossless
    * PNG — directly consumable by [[decodePixels]] / [[extractFeatures]].
    * A single-frame image yields its one real frame (not n pseudo-frames —
    * every emitted frame from a decodable input is a decodable raster).
    * Only formats with no JDK frame decoder (MP4 etc.) fall back to
    * deterministic byte slices so the generator shape holds for any
    * input. */
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
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val frames = ImageCodec.frames(bytes) match {
          case Some(fs) if fs.nonEmpty =>
            // n equal-stride real frames (all of them when n >= count)
            val take = math.min(n, fs.length)
            (0 until take).map { k =>
              ImageCodec.encode(fs(k * fs.length / take), "png")
            }
          case _ => StubCodec.sampleFrames(bytes, n)
        }
        frames.zipWithIndex.map { case (f, i) => Row(r.getString(pathIdx), i, f) }
      }
    }(enc)
  }
}
