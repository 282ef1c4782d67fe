package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class TextStatsSpec extends GraftSuite {
  import spark.implicits._

  test("tfIdf: corpus-wide term gets minimum idf, rare term ranks higher") {
    val docs = Seq(
      (1L, "common rare1 common filler"),
      (2L, "common filler other"),
      (3L, "common stuff more")
    ).toDF("doc_id", "text")
    val out = TextStats.tfIdf(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // df: common=3 docs, rare1=1 doc
    assert(out((1L, "common"))._2 === 3L)
    assert(out((1L, "rare1"))._2 === 1L)
    // idf(common) = ln(4/4)+1 = 1; tf=2 → tfidf 2.0 exactly
    assert(math.abs(out((1L, "common"))._3 - 2.0) < 1e-12)
    // rare1: ln(4/2)+1 ≈ 1.6931 > common's per-occurrence weight
    assert(out((1L, "rare1"))._3 > out((1L, "filler"))._3)
  }

  test("topTerms: k rows per doc, deterministic tie-break on term") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "aa aa zz")).toDF("doc_id", "text")
    val out = TextStats.topTerms(docs, "doc_id", "text", k = 2)
      .select("doc", "term", "rank").as[(Long, String, Int)].collect()
    assert(out.count(_._1 == 1L) === 2)
    // doc 1: all terms tf=1; unique terms (bb/cc/dd, df=1) outrank shared
    // 'aa' (df=2); ties alphabetical
    assert(out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq === Seq("bb", "cc"))
  }

  test("topNgrams counts distinct docs per shingle, not occurrences") {
    val docs = Seq(
      (1L, "x y z x y z"), // 'x y z' appears twice in one doc → counts once
      (2L, "x y z only")
    ).toDF("doc_id", "text")
    val out = TextStats.topNgrams(docs, "text", n = 3, k = 10)
      .as[(String, Long)].collect().toMap
    assert(out("x y z") === 2L)
  }

  test("deterministicSample: stable across invocations, rate approximately honored") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.25).as[Long].collect().sorted
    val b = Sampling.deterministicSample(df, "id", 0.25).as[Long].collect().sorted
    assert(a.toSeq === b.toSeq, "same sample every time")
    assert(math.abs(a.length / 10000.0 - 0.25) < 0.02, s"got ${a.length}")
    // nested rates: a 10% sample is a subset of the 25% sample
    val c = Sampling.deterministicSample(df, "id", 0.10).as[Long].collect().toSet
    assert(c.subsetOf(a.toSet))
  }

  test("assignSplit: disjoint, exhaustive, stable under corpus growth") {
    val df = spark.range(10000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplit(df, "id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.keySet === Set("train", "val", "test"), "exhaustive")
    assert(out.values.sum === 10000L, "disjoint: every row exactly once")
    assert(math.abs(out("train") / 10000.0 - 0.8) < 0.02)
    assert(math.abs(out("val") / 10000.0 - 0.1) < 0.01)
    // growing the table never moves an existing row between splits
    val small = Sampling.assignSplit(spark.range(1000).toDF("id"), "id", splits)
      .as[(Long, String)].collect().toMap
    val big = Sampling.assignSplit(df, "id", splits)
      .as[(Long, String)].collect().toMap
    assert(small.forall { case (k, v) => big(k) == v })
  }

  test("stratifiedSample honors per-stratum rates and drops unlisted strata") {
    val df = spark.range(20000)
      .select($"id", when($"id" % 2 === 0, "a").otherwise("b").as("s"))
    val out = Sampling.stratifiedSample(df, "id", "s", Map("a" -> 0.5))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(!out.contains("b"), "unlisted stratum dropped")
    assert(math.abs(out("a") / 10000.0 - 0.5) < 0.03)
  }

  test("weightedMix: copy counts converge to weights, deterministic, growth-stable") {
    val df = spark.range(10000)
      .select($"id", (concat(lit("s"), $"id" % 3)).as("dom"))
    val weights = Map("s0" -> 2.5, "s1" -> 0.4) // s2 keeps weight 1
    val out = Sampling.weightedMix(df, "id", "dom", weights)
    val counts = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    // ~3333 rows per domain; realized copies ≈ weight * n
    assert(math.abs(counts("s0") / 3334.0 - 2.5) < 0.1)
    assert(math.abs(counts("s1") / 3333.0 - 0.4) < 0.05)
    assert(counts("s2") === 3333L, "unlisted stratum: exactly one copy each")
    // per-row guarantees: floor(w) <= copies <= ceil(w), epochs 0..copies-1
    val perRow = out.filter($"dom" === "s0").groupBy("id").count()
      .as[(Long, Long)].collect()
    assert(perRow.forall(r => r._2 == 2L || r._2 == 3L))
    val epochs = out.filter($"id" === perRow.head._1).select("epoch")
      .as[Long].collect().sorted
    assert(epochs === (0L until perRow.head._2).toArray)
    // growth-stable: the same row draws the same copies in a bigger table
    val small = Sampling.weightedMix(df.limit(1000), "id", "dom", weights)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    val bigMap = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(small.forall { case (k, v) => bigMap(k) == v })
  }

  test("dupNgramRatio: hand-computed ratios, short-doc zero guard") {
    val df = Seq(
      (1L, "a b a b a"),   // words: 5 tok, 2 distinct → 3/5; bigrams:
                           // [a b, b a, a b, b a] → 2/4; trigrams:
                           // [a b a, b a b, a b a] → 1/3
      (2L, "x y z"),       // all distinct → 0 everywhere
      (3L, "w")            // 1 token: bigram/trigram guards → 0.0, not NaN
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextAnalysis.dupNgramRatio($"text", 1).as("d1"),
        TextAnalysis.dupNgramRatio($"text", 2).as("d2"),
        TextAnalysis.dupNgramRatio($"text", 3).as("d3"))
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((0.6, 0.5, 1.0 / 3)))
    assert(out(2L) === ((0.0, 0.0, 0.0)))
    assert(out(3L) === ((0.0, 0.0, 0.0)))
  }

  test("repetitionSignals: top-bigram fraction and short-doc zero guard") {
    val df = Seq(
      (1L, "a b a b c"),   // bigrams: a b(2), b a(1), b c(1) → top 2/4
      (2L, "solo")         // no bigrams → top_bigram_frac 0.0
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionSignals(df, "doc_id", "text")
      .select("doc", "n_words", "top_bigram_frac")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((5L, 0.5)))
    assert(out(2L) === ((1L, 0.0)))
  }

  test("unigramCrossEntropy matches hand-computed corpus unigram LM") {
    // counts: a=2 b=2 c=1, total 5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextStats.unigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val ce1 = math.log(5.0 / 2.0)                        // all tokens p=2/5
    val ce2 = (math.log(5.0 / 2.0) + math.log(5.0)) / 2  // b:2/5, c:1/5
    assert(out(1L) === ((3L, r6(ce1), r6(math.exp(ce1)))))
    assert(out(2L) === ((2L, r6(ce2), r6(math.exp(ce2)))))
  }

  test("bigramCrossEntropy matches hand-computed add-k bigram LM") {
    // doc "a b a": bigrams (a,"a b"), (b,"b a"); c1: a=2 b=1; V=2; k=0.5
    // p("a b") = (1+0.5)/(2+1) = 1/2;  p("b a") = (1+0.5)/(1+1) = 3/4
    val docs = Seq((1L, "a b a"), (2L, "x")).toDF("doc_id", "text")
    // doc 2 has a single token -> no bigrams -> absent from output;
    // but its token still trains c1/V (x enters the vocabulary)
    val out = TextStats.bigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // V=3 (a,b,x): p("a b") = 1.5/(2+1.5) = 3/7; p("b a") = 1.5/(1+1.5) = 3/5
    val ce = (math.log(7.0 / 3.0) + math.log(5.0 / 3.0)) / 2
    assert(out.keySet === Set(1L))
    assert(out(1L) === ((2L, r6(ce), r6(math.exp(ce)))))
  }

  test("packShards: exclusive prefix-sum boundaries, exhaustive + ordered") {
    // weights 6,6,6 with target 10: prefixes 0,6,12 → shards 0,0,1
    val df = Seq((1L, 6), (2L, 6), (3L, 6)).toDF("id", "w")
    val got = Sampling.packShards(df, "id", "w", targetPerShard = 10L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("packShards distributed prefix sum equals single-window reference") {
    val df = (1L to 200L).map(i => (i, (i * 37 % 91 + 1).toInt))
      .toDF("id", "w").repartition(7) // scrambled input layout
    val got = Sampling.packShards(df, "id", "w", targetPerShard = 500L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // reference: driver-side running sum in id order
    var cum = 0L
    val want = (1L to 200L).map { i =>
      val w = (i * 37 % 91 + 1).toLong
      val shard = cum / 500L
      cum += w
      i -> shard
    }.toMap
    assert(got === want)
  }

  test("packSequences: windows completely full, docs fully covered, boundaries split") {
    // lengths 300, 300, 100, 500 with ctx 512: doc 2 straddles the first
    // boundary, doc 4 straddles the second
    val df = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 500L))
      .toDF("id", "n").repartition(3)
    val got = Sampling.packSequences(df, "id", "n", ctxLen = 512L)
      .orderBy("id", "window")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got === Array(
      (1L, 0L, 0L, 0L, 300L),           // [0, 300)
      (2L, 0L, 0L, 300L, 212L),         // first 212 fill window 0
      (2L, 1L, 212L, 0L, 88L),          // remaining 88 open window 1
      (3L, 1L, 0L, 88L, 100L),
      (4L, 1L, 0L, 188L, 324L),         // fills window 1 to 512
      (4L, 2L, 324L, 0L, 176L)))        // tail opens window 2
    // invariants: every non-final window exactly full; docs fully covered
    val byWin = got.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(byWin(0L) === 512L && byWin(1L) === 512L && byWin(2L) === 176L)
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    assert(byDoc === Map(1L -> 300L, 2L -> 300L, 3L -> 100L, 4L -> 500L))
    // zero-length docs contribute nothing
    val withEmpty = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("id", "n")
    val ids = Sampling.packSequences(withEmpty, "id", "n", 512L)
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L))
  }

  test("weightedSample: k distinct rows, deterministic, and weight-dominant keys win") {
    // 5 ids carry 1000x the weight of the other 200: virtually certain to
    // be drawn into a k=20 sample; the rest fill by their own race
    val df = (1L to 205L).map(i => (i, if (i <= 5) 100000.0 else 100.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", k = 20)
      .select("id").as[Long].collect()
    assert(s1.length === 20 && s1.distinct.length === 20)
    assert((1L to 5L).forall(s1.contains), "heavy ids missing from sample")
    // same draw on re-run (pure function of key+weight)
    val s2 = Sampling.weightedSample(df.repartition(5), "id", "w", k = 20)
      .select("id").as[Long].collect()
    assert(s1.sorted.toSeq === s2.sorted.toSeq)
  }

  test("snapshotDiff classifies added, removed, changed, unchanged by key") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "price")
    val neu = Seq((1L, "a", 1.0), (2L, "b", 9.0), (4L, "d", 4.0))
      .toDF("k", "name", "price")
    val out = CatalogOps.snapshotDiff(old, neu, "k", Seq("name", "price"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("ringNegatives: k distinct-position partners per id, never self, retry-stable") {
    val df = (1L to 200L).toDF("id")
    val out = Sampling.ringNegatives(df, "id", k = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.forall { case (id, _, neg) => id != neg })
    // buckets here all have > 3 rows, so every id draws exactly 3
    val perId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(perId.values.forall(_ == Seq(1, 2, 3)))
    // pure function of the id set: repartitioned input draws the same pairs
    val again = Sampling.ringNegatives(df.repartition(7), "id", k = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.toSet === again.toSet)
  }

  test("weightedSample with equal weights is a plain uniform k-sample of the keys") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", k = 100)
      .select("id").as[Long].collect()
    assert(out.sorted.toSeq === (1L to 100L)) // k = n returns everything
  }
  test("dsirWeights favors target-domain documents; weights are finite") {
    import spark.implicits._
    val raw = Seq(
      (1L, "quantum entanglement decoherence qubit quantum"),
      (2L, "football goalkeeper penalty stadium referee"),
      (3L, "qubit superposition quantum gate entanglement"),
      (4L, "recipe butter flour oven sugar")
    ).toDF("doc_id", "text")
    val target = Seq(
      (10L, "quantum qubit entanglement superposition quantum gate"),
      (11L, "decoherence qubit quantum measurement")
    ).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L))
    assert(w(1L) > w(2L) && w(3L) > w(4L),
      s"physics docs must outweigh sports/cooking: $w")
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite),
      "smoothing keeps every weight finite")
    // selection = ranking: the top-2 are exactly the in-domain docs
    assert(w.toSeq.sortBy(-_._2).take(2).map(_._1).toSet === Set(1L, 3L))
  }

  test("dsirResample: seeded Gumbel top-k is retry-stable and seed-sensitive") {
    import spark.implicits._
    val raw = (0L until 40L)
      .map(i => (i, if (i % 4 == 0) "quantum qubit gate" else "misc word soup " + i))
      .toDF("doc_id", "text")
    val target = Seq((100L, "quantum qubit gate entanglement")).toDF("doc_id", "text")
    def ids(seed: String) = Sampling
      .dsirResample(raw, target, "doc_id", "text", n = 10, seed = seed)
      .orderBy("rank").select("doc").as[Long].collect().toSeq
    assert(ids("a") === ids("a"), "same seed → same sample, any retry")
    assert(ids("a") !== ids("b"), "different seed → different perturbation")
    // weights still dominate: in-domain docs are overrepresented
    val picked = ids("a")
    assert(picked.count(_ % 4 == 0) >= 5,
      s"importance weights must bias the draw, got $picked")
  }

}
