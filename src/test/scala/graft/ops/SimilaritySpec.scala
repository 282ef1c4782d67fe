package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends GraftSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine: orthogonal=0, parallel=1, antiparallel=-1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)),
      (Array(1.0f, 0.0f), Array(-3.0f, 0.0f))
    ).toDF("a", "b")
    val out = df.select(
      Similarity.cosine(Similarity.toDouble($"a"), Similarity.toDouble($"b")))
      .as[Double].collect()
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK: k rows per query, descending sim, no self-match") {
    val out = Similarity.bruteForceTopK(
      emb.filter($"vec_id" < 5), emb, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id", "sim", "rn")
      .as[(Long, Long, Double, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.size === 5 && byQ.values.forall(_.length === 5))
    assert(out.forall(r => r._1 != r._2))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bruteForceTopK rank-1 equals argmax over all cosines (hand check)") {
    val vecs = emb.select($"vec_id", Similarity.toDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = vecs(0L)
    val expected = vecs.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, BigDecimal(cos(q, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toSeq.sortBy { case (id, s) => (-s, id) }.head
    val got = Similarity.bruteForceTopK(
      emb.filter($"vec_id" === 0L), emb, "vec_id", "embedding", k = 1)
      .select("c_id", "sim").as[(Long, Double)].collect().head
    assert(got._1 === expected._1)
    assert(math.abs(got._2 - expected._2) < 1e-6)
  }

  test("ivfTopK: high recall vs brute force on local fixture") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 4)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall") // 4/8 cells probed
    assert(approx.groupBy(_._1).values.forall(_.size <= 5))
  }

  test("int8 quantization: 4x smaller, cosine preserved within step error") {
    val q = emb.select($"vec_id", Similarity.quantizeInt8($"embedding").as("z"),
      Similarity.toDouble($"embedding").as("v"))
    val cosines = q.select(
      Similarity.cosine(Similarity.dequantizeInt8($"z"), $"v")).as[Double].collect()
    assert(cosines.forall(c => c > 0.995), s"min cos ${cosines.min}")
    // q values stay within int8 range
    val maxQ = q.select(array_max(transform($"z.q", _.cast("int")))).as[Int].collect()
    assert(maxQ.forall(m => m <= 127))
    // zero vector: scale 0, all-zero codes
    val zero = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(Similarity.quantizeInt8($"embedding").as("z"))
    val r = zero.select($"z.scale", $"z.q").collect().head
    assert(r.getDouble(0) === 0.0)
    assert(r.getSeq[Byte](1).forall(_ === 0))
  }

  test("nearDupPairs finds planted duplicate with cosine 1.0") {
    val corpus = emb.select($"vec_id", $"embedding")
      .union(emb.filter($"vec_id" === 7L)
        .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val pairs = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.99)
      .select("ida", "idb", "cos").as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 7L && p._2 == 10007L && p._3 >= 0.999999))
  }

  test("cosineLshPairs equals the exact nearDupPairs output on the fixture") {
    val corpus = emb.select($"vec_id", $"embedding")
      .union(emb.filter($"vec_id" < 50)
        .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val exact = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Similarity.cosineLshPairs(corpus, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty)
  }

  test("cosineLshPairs: small explicit numPlanes gets >=1 band, not 0") {
    // numPlanes in 1..7 with bands unset used to truncate to 0 bands
    val corpus = emb.select($"vec_id", $"embedding")
      .union(emb.filter($"vec_id" === 7L)
        .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val pairs = Similarity.cosineLshPairs(corpus, "vec_id", "embedding", 0.99,
      numPlanes = 6)
    assert(pairs.collect().exists(r =>
      r.getLong(0) == 7L && r.getLong(1) == 10007L))
  }

  test("cosineLshPairs auto mode validates threshold range") {
    val corpus = emb.select($"vec_id", $"embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineLshPairs(corpus, "vec_id", "embedding", -0.5)
    }
    assert(e.getMessage.contains("threshold"))
  }

  test("nearDupPairsBlocked rejects a corpus beyond its driver-bounded gate") {
    val corpus = emb.select($"vec_id", $"embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.nearDupPairsBlocked(corpus, "vec_id", "embedding", 0.95,
        maxRows = 10)
    }
    assert(e.getMessage.contains("driver-bounded"))
  }

  test("nearDupPairsBlockJoin is bit-identical to nearDupPairs across block sizes") {
    val corpus = emb.select($"vec_id", $"embedding")
      .union(emb.filter($"vec_id" < 50)
        .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val declarative = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(declarative.nonEmpty)
    // one block (pure in-block i<j loop), many tiny blocks (mostly
    // cross-block pairs), and a mid size exercising both paths
    for (rpb <- Seq(1 << 20, 7, 256)) {
      val blocked = Similarity.nearDupPairsBlockJoin(
        corpus, "vec_id", "embedding", 0.9, rowsPerBlock = rpb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(blocked === declarative, s"mismatch at rowsPerBlock=$rpb")
    }
  }

  test("nearDupPairsBlocked is bit-identical to the declarative nearDupPairs") {
    val corpus = emb.select($"vec_id", $"embedding")
      .union(emb.filter($"vec_id" < 50)
        .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val declarative = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Similarity.nearDupPairsBlocked(corpus, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked === declarative)
    assert(declarative.nonEmpty)
  }
}
