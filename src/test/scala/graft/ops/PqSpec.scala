package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class PqSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("trainDict + encode reconstructs every vector exactly (lossless by construction)") {
    val cb = Pq.trainDict(emb, "embedding", m = 8)
    assert(cb.m === 8 && cb.ds === 8)
    val encoded = Pq.encode(emb, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int], Double)].collect()
      .map { case (id, c, n) => id -> ((c, n)) }.toMap
    val originals = emb.select($"vec_id", Similarity.toDouble($"embedding"))
      .as[(Long, Seq[Double])].collect()
    assert(originals.nonEmpty)
    originals.foreach { case (id, v) =>
      val (codes, _) = encoded(id)
      assert(codes.length === 8)
      val recon = codes.zipWithIndex.flatMap { case (c, j) => cb.cents(j)(c) }
      assert(recon.toSeq === v, s"vec $id not reconstructed exactly")
    }
  }

  test("dict-codebook ADC top-k matches brute-force top-k ids") {
    val cb = Pq.trainDict(emb, "embedding", m = 8)
    val encoded = Pq.encode(emb, "vec_id", "embedding", cb)
    val adc = Pq.topKAdc(emb.filter($"vec_id" < 10), encoded,
        "vec_id", "embedding", cb, k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(
        emb.filter($"vec_id" < 10), emb, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    assert(adc === exact)
  }

  test("kmeans-codebook ADC: shortlist recall floor holds; rerank recovers exact-tier recall") {
    val cb = Pq.trainKmeans(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    assert(cb.cents.forall(_.length <= 16))
    val encoded = Pq.encode(emb, "vec_id", "embedding", cb)
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    // plain ADC@5: the synthetic embeddings are RANDOM — the hardest,
    // incompressible case for any 32x quantizer — so the floor is modest
    val adc = Pq.topKAdc(queries, encoded, "vec_id", "embedding", cb, k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val adcRecall = exact.intersect(adc).size.toDouble / exact.size
    assert(adcRecall >= 0.15, s"plain ADC recall collapsed: $adcRecall")
    assert(adc.groupBy(_._1).values.forall(_.size === 5))
    // ADC shortlist (pool=50) + exact rerank: recall is bounded by the
    // shortlist, not the quantization error — this is the production tier
    val reranked = Pq.topKAdcRerank(queries, encoded, emb,
        "vec_id", "embedding", cb, k = 5, pool = 50)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val rrRecall = exact.intersect(reranked).size.toDouble / exact.size
    assert(rrRecall >= 0.7, s"reranked recall too low: $rrRecall")
    assert(rrRecall > adcRecall, "rerank must improve on plain ADC here")
  }

  test("topKAdc guards zero-norm vectors: no NaN rows hijack the top-k window") {
    // an all-zero query or corpus vector yields denominator 0; unguarded,
    // 0/0 = NaN and Spark ranks NaN LARGEST descending — NaN rows would
    // fill the top-k for every query. Guarded, zero-norm sims are 0.0.
    val dim = 16
    // all-positive components → every real cosine is > 0, so the guarded
    // zero vector (sim 0.0) must rank strictly last
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => ((seed * 31 + i * 7) % 13 + 1).toFloat)
    val rows = (1L to 20L).map(i => (i, vec(i.toInt))) :+
      (99L, Array.fill(dim)(0f)) // zero corpus vector
    val corpus = rows.toDF("vec_id", "embedding")
    val cb = Pq.trainDict(corpus, "embedding", m = 4)
    val encoded = Pq.encode(corpus, "vec_id", "embedding", cb)
    val queries = Seq((1L, vec(1)), (98L, Array.fill(dim)(0f)))
      .toDF("vec_id", "embedding")
    val got = Pq.topKAdc(queries, encoded, "vec_id", "embedding", cb, k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.forall(r => !r._3.isNaN), "NaN similarity leaked into top-k")
    // the zero QUERY scores every candidate 0.0 (never NaN)
    assert(got.filter(_._1 == 98L).forall(_._3 === 0.0))
    // the zero CORPUS vector cannot outrank a real neighbor for query 1
    val q1Top = got.filter(_._1 == 1L).minBy(_._4)
    assert(q1Top._2 !== 99L)
  }

  test("topKAdc rejects an oversized query set at its driver-bounded gate") {
    val cb = Pq.trainDict(emb.limit(50), "embedding", m = 8)
    val encoded = Pq.encode(emb.limit(50), "vec_id", "embedding", cb)
    val e = intercept[IllegalArgumentException] {
      Pq.topKAdc(emb, encoded, "vec_id", "embedding", cb, k = 5, maxQueries = 3)
    }
    assert(e.getMessage.contains("driver-bounded"))
  }
}
