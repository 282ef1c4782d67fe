package graft.ops

import graft.GraftSuite

class BpeSpec extends GraftSuite {
  import spark.implicits._

  test("train learns merges in frequency order with lexicographic tie-break") {
    // counts: "aa" x3, "ab" x1 → pair (a,a) count 3 beats (a,b) count 1
    val docs = Seq((1L, "aa ab"), (2L, "aa aa")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 5)
    assert(merges.take(2) === Seq(("a", "a"), ("a", "b")))
    assert(merges.length === 2) // dictionary exhausts: no further pairs
  }

  test("encodeWord applies lowest-ranked merges first (hand-derived)") {
    val ranks = Map(("a", "a") -> 0, ("a", "b") -> 1)
    assert(Bpe.encodeWord("aab", ranks) === Seq("aa", "b"))
    assert(Bpe.encodeWord("abaa", ranks) === Seq("ab", "aa"))
    assert(Bpe.encodeWord("a", ranks) === Seq("a"))
    assert(Bpe.encodeWord("zz", ranks) === Seq("z", "z")) // no merge applies
  }

  test("classic low/lower corpus: frequent subword becomes one token") {
    val docs = Seq((1L, "low low low lower lowest")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 2)
    // 'l o' (count 5) then 'lo w' (count 5) merge first: "low" is one token
    assert(merges === Seq(("l", "o"), ("lo", "w")))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("low", ranks) === Seq("low"))
    assert(Bpe.encodeWord("lower", ranks).head === "low")
  }

  test("tokenize: per-doc counts, deterministic across partitionings") {
    val docs = Seq((1L, "low low lower"), (2L, ""), (3L, "xyz")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    val out = Bpe.tokenize(docs, "id", "text", merges)
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 3) // 3 words
    assert(out(2L) === ((2L, 0, 0, 0.0)))
    val again = Bpe.tokenize(docs.repartition(3), "id", "text", merges)
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(again === out)
  }

  test("train fails clearly when even min-count escalation empties the dict") {
    // 150 distinct hapax words, gate of 10: threshold escalation (1→2)
    // drops EVERYTHING — that corpus has no frequent vocabulary to learn
    // from and must fail with the gate named, not train on junk
    val docs = (1 to 50).map(i => (i.toLong, s"w$i u$i v$i")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", numMerges = 2, maxVocabWords = 10)
    }
    assert(e.getMessage.contains("maxVocabWords"))
  }

  test("train survives a vocabulary beyond the gate: hapax tail is dropped") {
    // 200 distinct hapax words (vocabulary 204 ≫ gate 10) plus a small
    // frequent core; the old hard gate failed here. Escalation to
    // min-count 2 keeps only the 4-word core, and the learned merges are
    // EXACTLY the ones training on the core alone produces — the hapax
    // tail cannot affect the outcome it was dropped from.
    val tail = (1 to 100).map(i => (i.toLong, s"junk$i noise$i"))
    val core = (101 to 110).map(i => (i.toLong, "low low lower lowest"))
    val docs = (tail ++ core).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4, maxVocabWords = 10)
    val coreOnly = Bpe.train(core.toDF("id", "text"), "text", numMerges = 4)
    assert(merges === coreOnly)
    assert(merges.take(2) === Seq(("l", "o"), ("lo", "w")))
    // explicit prefilter reaches the same state without escalation probes
    val explicitMin = Bpe.train(docs, "text", numMerges = 4,
      maxVocabWords = 10, minWordCount = 2L)
    assert(explicitMin === merges)
  }
}
