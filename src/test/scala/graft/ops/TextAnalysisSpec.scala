package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends GraftSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(
      implicit enc: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c).as[T].collect().head

  test("regexTokens splits on non-alphanumerics and lowercases") {
    assert(one[Seq[String]](TextAnalysis.regexTokens($"text"), "Hello, World!  42")
      === Seq("hello", "world", "42"))
  }

  test("tokenCount / bpeishTokenCount") {
    assert(one[Int](TextAnalysis.tokenCount($"text"), "one two three") === 3)
    // "extraordinarily" (15 chars) -> 1 + floor(15/6) = 3 pieces
    assert(one[Long](TextAnalysis.bpeishTokenCount($"text"), "a extraordinarily") === 1L + 3L)
  }

  test("stopwordRatio exact fraction") {
    val r = one[Double](
      TextAnalysis.stopwordRatio(TextAnalysis.wsTokens($"text"), LangId.en),
      "the cat sat on the mat")
    assert(math.abs(r - 2.0 / 6.0) < 1e-12)
  }

  test("qualityScore in [0,1]; prose scores above junk") {
    val prose = one[Double](TextAnalysis.qualityScore($"text"),
      "the quick brown fox jumps over the lazy dog and runs to the forest")
    val junk = one[Double](TextAnalysis.qualityScore($"text"), "@@@@ #### 1234 %%%%")
    assert(prose >= 0.0 && prose <= 1.0 && junk >= 0.0 && junk <= 1.0)
    assert(prose > junk)
  }

  test("fingerprint is normalization-invariant; rollingHash deterministic in range") {
    val a = one[String](TextAnalysis.fingerprint($"text"), "Hello,   World!")
    val b = one[String](TextAnalysis.fingerprint($"text"), "hello world")
    assert(a === b)
    val h1 = one[Long](TextAnalysis.rollingHash($"text"), "hello world")
    val h2 = one[Long](TextAnalysis.rollingHash($"text"), "hello world")
    val h3 = one[Long](TextAnalysis.rollingHash($"text"), "world hello") // order-sensitive
    assert(h1 === h2 && h1 != h3)
    assert(h1 >= 0 && h1 < 2147483647L)
  }

  test("cjkRatio detects Han text; langId routes zh/en/es/de/fr") {
    assert(one[Double](TextAnalysis.cjkRatio($"text"), "你好世界") === 1.0)
    assert(one[Double](TextAnalysis.cjkRatio($"text"), "hello") === 0.0)
    def pred(t: String): String =
      one[String](LangId.predict($"text").getField("predicted"), t)
    assert(pred("你好世界你好世界") === "zh")
    assert(pred("the cat is in the house") === "en")
    assert(pred("el gato que vive en la casa") === "es")
    assert(pred("der hund ist von den bergen") === "de")
    assert(pred("les chats est une du chien") === "fr")
    assert(pred("xyzzy plugh") === "unknown")
  }

  test("chunk: overlapping windows cover every token; partial tail kept") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val df = Seq(text).toDF("text")
    val chunks = df.select(posexplode(TextAnalysis.chunk($"text", 4, 1)))
      .select($"col.chunk_idx", $"col.chunk", $"col.n_tokens")
      .as[(Int, String, Int)].collect().sortBy(_._1)
    // step 3: starts 1,4,7 → [t1..t4], [t4..t7], [t7..t10]
    assert(chunks.map(_._2).toSeq === Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(chunks.map(_._3).toSeq === Seq(4, 4, 4))
    // 11 tokens → a 2-token partial tail survives
    val tail = Seq((1 to 11).map(i => s"t$i").mkString(" ")).toDF("text")
      .select(posexplode(TextAnalysis.chunk($"text", 4, 1)))
      .select($"col.chunk", $"col.n_tokens").as[(String, Int)].collect()
    assert(tail.last === (("t10 t11", 2)))
    // overlap reconstruction: dropping the first `overlap` tokens of every
    // chunk after the first re-yields the original token stream
    val rebuilt = chunks.map(_._2.split(" ")).zipWithIndex
      .flatMap { case (t, i) => if (i == 0) t else t.drop(1) }.mkString(" ")
    assert(rebuilt === text)
  }

  test("cleanText strips tags/control chars and collapses whitespace") {
    val df = Seq("<b>hello</b>\u0001  world <br/> again ").toDF("t")
    val out = df.select(TextAnalysis.cleanText($"t")).as[String].collect().head
    assert(out === "hello world again")
  }

  test("redactPii masks emails, urls, and digit runs; plain text untouched") {
    val df = Seq(
      "mail a.b+c@ex-ample.org now",
      "go to https://x.io/p?q=1 ok",
      "call 0012 345 6789 today",
      "year 2024 is fine"
    ).toDF("t")
    val out = df.select(TextAnalysis.redactPii($"t")).as[String].collect()
    assert(out(0) === "mail <EMAIL> now")
    assert(out(1) === "go to <URL> ok")
    assert(out(2) === "call <NUM> today")
    assert(out(3) === "year 2024 is fine") // short digit run survives
  }

  test("compressionSignals: repetitive text compresses far below prose; deterministic") {
    val docs = Seq(
      (1L, "spam " * 200),                                  // boilerplate
      (2L, (1 to 200).map(i => s"w${i * 7 % 113}x$i").mkString(" ")), // high-entropy
      (3L, "")
    ).toDF("id", "text")
    val out = TextAnalysis.compressionSignals(docs, "id", "text")
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 < 0.1, s"boilerplate should crush: ${out(1L)}")
    assert(out(2L)._4 > 0.3, s"high-entropy should resist: ${out(2L)}")
    assert(out(3L) === ((3L, 0, out(3L)._3, 0.0))) // empty input: ratio 0
    // pure function of the bytes: identical on a rerun with other layout
    val again = TextAnalysis.compressionSignals(docs.repartition(3), "id", "text")
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    assert(again === out)
  }
}
