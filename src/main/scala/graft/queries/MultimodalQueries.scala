package graft.queries

import graft.{QueryDef, QueryGroup}
import graft.multimodal.{AudioCodec, ImageCodec, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal decode queries — REAL pixel/PCM decode under the oracle gate.
  *
  * DuckDB cannot decode images or audio, so the oracle side is analytic:
  * fixture media are deterministic synthetic patterns (pure integer
  * functions of (x, y, seed) / sample index), their statistics are computed
  * straight from the formula with NO image/audio code (see
  * [[ImageCodec.expectedPatternSums]] and the pure loops below), and
  * embedded as typed VALUES. The Spark side takes the long way round —
  * encode to real PNG/WAV bytes, decode with the real codecs
  * (javax.imageio / PCM16), one-pass pixel/sample statistics — so a green
  * row proves the full encode→decode→stats path agrees with ground truth.
  * PNG and PCM are lossless, which is what makes exact equality possible;
  * lossy JPEG is covered by tolerance specs instead (ImageCodecSpec).
  */
object MultimodalQueries extends QueryGroup {

  /** (id, width, height, seed) for the image fixture corpus. */
  private val imageFixtures: Seq[(String, Int, Int, Int)] =
    (0 until 4).map(s => (s"img$s", 64 + s * 16, 48 + s * 8, s))

  private def imageCorpus(s: SparkSession): DataFrame = {
    import s.implicits._
    imageFixtures.map { case (id, w, h, seed) =>
      (id, ImageCodec.encode(ImageCodec.testPattern(w, h, seed), "png"))
    }.toDF("path", "content")
  }

  private val imageOracle: String = {
    val rows = imageFixtures.map { case (id, w, h, seed) =>
      val (r, g, b) = ImageCodec.expectedPatternSums(w, h, seed)
      s"('$id', 'png', $w, $h, 3, CAST(${w.toLong * h} AS BIGINT), " +
        s"CAST($r AS BIGINT), CAST($g AS BIGINT), CAST($b AS BIGINT))"
    }
    s"""SELECT * FROM (VALUES ${rows.mkString(",\n  ")})
       |AS t(path, format, width, height, channels, n_pixels, sum_r, sum_g, sum_b)
       |ORDER BY path""".stripMargin
  }

  /** (id, channels, rate, nSamples) for the audio fixture corpus; sample i
    * of fixture k is ((i * 37 + k * 101) % 4001 - 2000) — spans the int16
    * range sign-symmetrically without clipping. */
  private val audioFixtures: Seq[(String, Int, Int, Int)] =
    Seq(("wav0", 1, 8000, 8000), ("wav1", 2, 44100, 4000))

  private def audioSample(k: Int)(i: Int): Int = (i * 37 + k * 101) % 4001 - 2000

  private def audioCorpus(s: SparkSession): DataFrame = {
    import s.implicits._
    audioFixtures.zipWithIndex.map { case ((id, ch, rate, n), k) =>
      (id, AudioCodec.pcm16Wav(ch, rate,
        Array.tabulate(n)(i => audioSample(k)(i).toShort)))
    }.toDF("path", "content")
  }

  private val audioOracle: String = {
    val rows = audioFixtures.zipWithIndex.map { case ((id, ch, rate, n), k) =>
      // analytic ground truth: pure loop on the sample formula, no codec
      var sum = 0L; var peak = 0
      var i = 0
      while (i < n) {
        val v = audioSample(k)(i)
        sum += v; if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      val dur = BigDecimal(n / ch).setScale(0) // frames
      s"('$id', $ch, $rate, CAST($n AS BIGINT), " +
        s"round(CAST($dur AS DOUBLE) / $rate, 6), CAST($sum AS BIGINT), $peak)"
    }
    s"""SELECT * FROM (VALUES ${rows.mkString(",\n  ")})
       |AS t(path, channels, sample_rate, n_samples, duration_sec, sum_samples, peak)
       |ORDER BY path""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // Real javax.imageio pixel decode: PNG-encoded deterministic patterns →
    // decoded raster dims/channels + exact per-channel pixel sums, checked
    // against formula-derived ground truth.
    QueryDef(
      "m_image_pixel_stats",
      (s, _) => Multimodal.decodePixels(imageCorpus(s))
        .select(col("path"), col("format"), col("width"), col("height"),
          col("channels"), col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("path"),
      Some(imageOracle)),

    // Real PCM16 WAV decode: synthesized ramps → exact sample count/sum/peak
    // + duration, checked against formula-derived ground truth.
    QueryDef(
      "m_audio_pcm_stats",
      (s, _) => Multimodal.decodeAudio(audioCorpus(s))
        .select(col("path"), col("channels"), col("sample_rate"), col("n_samples"),
          round(col("duration_sec"), 6).as("duration_sec"),
          col("sum_samples"), col("peak"))
        .orderBy("path"),
      Some(audioOracle)),

    // Perceptual-hash image dedup: PNG / JPEG / downscaled re-encodings of
    // the same patterns pair up despite fully different bytes (banded
    // Hamming self-join over dHash — the bucketed 100 TB shape). The
    // PAIR SET is fully deterministic (each base image's three
    // re-encodings pair up, zero cross-image pairs — the dedup claim
    // itself), and so are the Hamming distances of the LOSSLESS legs
    // (exact PNG decode + this library's own boxResize/dHash); only the
    // JPEG legs' exact distances depend on the JDK encoder's
    // quantization, so those report membership with a NULL distance.
    // Hash-gated against a VALUES oracle; JPEG distances stay pinned
    // (≤ banding slack) in MultimodalOpsSpec.
    QueryDef(
      "m_image_neardup",
      (s, _) => {
        import s.implicits._
        val reencoded = imageFixtures.flatMap { case (id, w, h, seed) =>
          val img = ImageCodec.testPattern(w, h, seed)
          Seq(
            (s"$id.png", ImageCodec.encode(img, "png")),
            (s"$id.jpg", ImageCodec.encode(img, "jpg")),
            (s"$id.half.png",
              ImageCodec.encode(ImageCodec.boxResize(img, w / 2, h / 2), "png")))
        }.toDF("path", "content")
        Multimodal.imageNearDupPairs(reencoded, maxHamming = 5)
          .withColumn("lossless_hamming",
            when(!col("patha").endsWith(".jpg") &&
                !col("pathb").endsWith(".jpg"), col("hamming"))
              .cast("int"))
          .select("patha", "pathb", "lossless_hamming")
          .orderBy("patha", "pathb")
      },
      Some("""SELECT * FROM (VALUES
             |  ('img0.half.png', 'img0.jpg', CAST(NULL AS INT)),
             |  ('img0.half.png', 'img0.png', 1),
             |  ('img0.jpg', 'img0.png', CAST(NULL AS INT)),
             |  ('img1.half.png', 'img1.jpg', CAST(NULL AS INT)),
             |  ('img1.half.png', 'img1.png', 3),
             |  ('img1.jpg', 'img1.png', CAST(NULL AS INT)),
             |  ('img2.half.png', 'img2.jpg', CAST(NULL AS INT)),
             |  ('img2.half.png', 'img2.png', 2),
             |  ('img2.jpg', 'img2.png', CAST(NULL AS INT)),
             |  ('img3.half.png', 'img3.jpg', CAST(NULL AS INT)),
             |  ('img3.half.png', 'img3.png', 0),
             |  ('img3.jpg', 'img3.png', CAST(NULL AS INT))
             |) AS t(patha, pathb, lossless_hamming)
             |ORDER BY patha, pathb""".stripMargin)),

    // Typed media dispatch over a mixed corpus through the header-only
    // metadata fast path (decode() routes real PNG/WAV headers vs opaque
    // bytes) — format histogram is analytic.
    QueryDef(
      "m_media_type_dispatch",
      (s, _) => {
        import s.implicits._
        val mixed = imageCorpus(s)
          .union(audioCorpus(s))
          .union(Seq(("blob0", "opaque payload, not media".getBytes("UTF-8")))
            .toDF("path", "content"))
        Multimodal.decode(mixed, "image")
          .groupBy(col("meta.format").as("format"))
          .agg(count(lit(1)).as("n"))
          .orderBy("format")
      },
      Some("""SELECT * FROM (VALUES
             |  ('bin', CAST(1 AS BIGINT)),
             |  ('png', CAST(4 AS BIGINT)),
             |  ('wav', CAST(2 AS BIGINT))) AS t(format, n)
             |ORDER BY format""".stripMargin))
  )
}
