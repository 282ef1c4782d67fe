package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** Semantics of the curation tier: BM25 retrieval, k-means, SemDeDup. */
class CurationSpec extends GraftSuite {
  import spark.implicits._

  // --- BM25 ---

  test("bm25: docs matching more query terms with shorter length rank first") {
    val docs = Seq(
      (1L, "spark join hash spark"), // tf(spark)=2, 3 distinct matches
      (2L, "spark filter filter filter filter filter filter filter"),
      (3L, "table scan group value"), // no query terms
      (4L, "spark join")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join", "hash"), k = 10).collect()
    val ranked = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc"))
    // doc 3 has no query term -> absent entirely
    assert(!ranked.contains(3L))
    assert(out.length === 3)
    // doc 1 matches all three terms -> top; doc 4 (2 terms, short) beats
    // doc 2 (1 term, long)
    assert(ranked.head === 1L)
    assert(ranked(1) === 4L)
    assert(ranked(2) === 2L)
  }

  test("bm25: hand-computed single-term score") {
    // one doc, one term: idf = ln(1 + (1-1+0.5)/(1+0.5)) = ln(4/3)
    // tf=1, dl=avgdl=2 -> w = idf * (1*2.2)/(1 + 1.2*(0.25+0.75*1)) = idf
    val docs = Seq((1L, "spark x")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 1)
      .collect()
    assert(out.length === 1)
    val expected = BigDecimal(math.log(1 + 0.5 / 1.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("score") === expected)
  }

  test("phrase search: counts consecutive-token occurrences only") {
    val docs = Seq(
      (1L, "spark join now spark join later"), // 2 occurrences
      (2L, "join spark"),                      // reversed -> no match
      (3L, "spark x join"),                    // gap -> no match
      (4L, "SPARK Join!")                      // case/punct-normalized match
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("n_matches")).toMap
    assert(out === Map(1L -> 2L, 4L -> 1L))
  }

  test("phrase search: three-term phrase chains the position joins") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b x c"), (3L, "x a b c y a b c")
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("n_matches")).toMap
    assert(out === Map(1L -> 1L, 3L -> 2L))
  }

  test("hashed classifier: deterministic, bounded, monotone in token weight") {
    val docs = Seq((1L, "spark spark"), (2L, "spark spark")).toDF("doc_id", "text")
    val s = docs.select(Retrieval.hashedLinearScore(col("text")).as("s"))
      .collect().map(_.getDouble(0))
    assert(s(0) === s(1)) // same text -> same score
    assert(s(0) > 0 && s(0) < 1)
    // single-token doc: score = sigmoid(4 * (bucket/65536 - 0.5)) exactly
    val w = 0x98f1 / 65536.0 - 0.5 // md5("spark") 16-bit prefix = 0x98f1
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-4.0 * w)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val one = Seq((1L, "spark")).toDF("doc_id", "text")
      .select(Retrieval.hashedLinearScore(col("text"))).head.getDouble(0)
    assert(one === expected)
  }

  // --- k-means ---

  private def vecDf(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "vec").select(col("id"),
      transform(col("vec"), _.cast("float")).as("vec"))

  test("kmeans: two well-separated blobs split into their own clusters") {
    // seeds are the 2 smallest ids: id 0 lands in blob A, id 1 in blob B
    val pts = Seq(
      0L -> Seq(0.0, 0.1), 2L -> Seq(0.1, 0.0), 3L -> Seq(0.1, 0.1),
      1L -> Seq(9.0, 9.1), 11L -> Seq(9.1, 9.0), 12L -> Seq(9.0, 9.0))
    val out = Clustering.kmeansAssign(vecDf(pts), "id", "vec", k = 2, iters = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(Set(0L, 2L, 3L).map(out) === Set(0L))
    assert(Set(1L, 11L, 12L).map(out) === Set(1L))
  }

  test("kmeans: every input appears exactly once with non-negative dist") {
    val pts = (0L until 20L).map(i => i -> Seq(i.toDouble, (i % 7).toDouble))
    val out = Clustering.kmeansAssign(vecDf(pts), "id", "vec", k = 4, iters = 2)
      .collect()
    assert(out.map(_.getAs[Long]("id")).sorted === (0L until 20L).toArray)
    // dist is the expansion e·e - 2e·c + c·c of a true squared distance;
    // rounding the centroid can make it dip microscopically below zero,
    // never materially
    assert(out.forall(_.getAs[Double]("dist") > -1e-6))
  }

  // --- winnowing ---

  test("winnowing: shared k+w-1 token run guarantees a shared fingerprint") {
    val run = "alpha beta gamma delta epsilon zeta" // 6 tokens = k+w-1
    val docs = Seq(
      (1L, s"one two $run three"),
      (2L, s"$run completely different tail here")).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        explode(TextAnalysis.winnowFingerprints(col("text"), 3, 4)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty) // the winnowing density guarantee
  }

  test("winnowing: short docs yield no fingerprints; output sorted distinct") {
    val docs = Seq((1L, "too few tokens here"), // 4 < k+w-1 = 6
      (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.winnowFingerprints(col("text"), 3, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).nonEmpty)
    assert(out(2L) === out(2L).distinct.sorted)
  }

  // --- repeated-span scrub ---

  test("span scrub: removes only tokens covered by cross-doc repeated spans") {
    val boiler = "all rights reserved worldwide"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"delta $boiler epsilon zeta"),
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 4, minDf = 2)
      .collect().map(r => r.getAs[Long]("doc") ->
        ((r.getAs[String]("text_clean"), r.getAs[Long]("n_removed")))).toMap
    assert(out(1L) === (("alpha beta gamma", 4L)))
    assert(out(2L) === (("delta epsilon zeta", 4L)))
    assert(out(3L) === (("nothing shared here at all", 0L)))
  }

  test("span scrub: fully-scrubbed doc emits empty text, short docs survive") {
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "one two three four"), // exact copy: both fully covered
      (3L, "tiny doc")            // < n tokens: no shingles, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 4, minDf = 2)
      .collect().map(r => r.getAs[Long]("doc") ->
        ((r.getAs[String]("text_clean"), r.getAs[Long]("n_kept")))).toMap
    assert(out(1L) === (("", 0L)) && out(2L) === (("", 0L)))
    assert(out(3L) === (("tiny doc", 2L)))
  }

  test("span scrub: overlapping occurrences of the same span union their cover") {
    // "a b a b a b" with n=2, minDf=2: "a b"/"b a" shared across docs
    val docs = Seq((1L, "a b a b c"), (2L, "x a b y")).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 2, minDf = 2)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[String]("text_clean")).toMap
    // doc1: "a b a b" covered (positions 1-4), "c" survives ("b c" df=1, but
    // position 4 'b' already covered by "a b" at 3-4)
    assert(out(1L) === "c")
    assert(out(2L) === "x y")
  }

  // --- SemDeDup ---

  test("semdedup: drops exact copies, keeps originals and singletons") {
    val base = Seq(
      0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0),
      2L -> Seq(0.0, 0.0, 1.0))
    val corpus = vecDf(base ++ base.map { case (i, v) => (i + 100) -> v })
    val out = Clustering.semDedup(corpus, "id", "vec",
        k = 3, iters = 2, threshold = 0.95)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("keep")).toMap
    assert(Seq(0L, 1L, 2L).forall(out(_)))
    assert(Seq(100L, 101L, 102L).forall(!out(_)))
  }

  test("semdedup: near-but-below-threshold pairs both survive") {
    val corpus = vecDf(Seq(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.8, 0.6))) // cos = 0.8
    val out = Clustering.semDedup(corpus, "id", "vec",
        k = 1, iters = 1, threshold = 0.95)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("keep")).toMap
    assert(out(0L) && out(1L))
  }

  test("semdedup auto-k: exact copies are caught under any clustering") {
    // k <= 0 auto-sizes k from the corpus; identical vectors always share
    // a cluster, so exact-twin recall is invariant to the chosen k
    val base = Seq(
      0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0),
      2L -> Seq(0.0, 0.0, 1.0))
    val corpus = vecDf(base ++ base.map { case (i, v) => (i + 100) -> v })
    val out = Clustering.semDedup(corpus, "id", "vec",
        k = 0, iters = 2, threshold = 0.95)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("keep")).toMap
    assert(Seq(0L, 1L, 2L).forall(out(_)))
    assert(Seq(100L, 101L, 102L).forall(!out(_)))
  }
}
