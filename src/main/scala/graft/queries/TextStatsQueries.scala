package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.{Sampling, TextStats}
import org.apache.spark.sql.functions._

/** Corpus statistics (TF-IDF term ranking, boilerplate n-gram counts) and
  * deterministic sampling — the profiling / split-drawing tier of a
  * training-data pipeline. All oracles recompute the same pure functions in
  * DuckDB (identical expression shapes, per README methodology).
  */
object TextStatsQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // Top-3 TF-IDF terms per document (smooth idf, deterministic ties).
    QueryDef(
      "x_tfidf_topterms",
      (s, d) =>
        TextStats.topTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
          .select(col("doc"), col("term"), col("tf"), col("df"),
            round(col("tfidf"), 6).as("tfidf"), col("rank"))
          .orderBy("doc", "rank"),
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                       x -> len(x) > 0)) AS term
             |  FROM documents),
             |tf AS (SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
             |t AS (SELECT doc, tf.term, tf, df,
             |        tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS tfidf
             |      FROM tf JOIN df USING (term), n),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc
             |                 ORDER BY tfidf DESC, term) AS rank FROM t)
             |SELECT doc, term, tf, df, round(tfidf, 6) AS tfidf, rank
             |FROM r WHERE rank <= 3 ORDER BY doc, rank""".stripMargin)),

    // Corpus-wide top-50 trigram document frequencies (boilerplate signal).
    QueryDef(
      "x_top_ngrams",
      (s, d) =>
        TextStats.topNgrams(Tables.documents(s, d), "text", n = 3, k = 50),
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') w
             |  FROM documents),
             |sh AS (SELECT doc_id,
             |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) s
             |       FROM toks WHERE len(w) >= 3),
             |ex AS (SELECT doc_id, unnest(s) AS ngram FROM sh)
             |SELECT ngram, COUNT(*) AS n_docs FROM ex
             |GROUP BY ngram ORDER BY n_docs DESC, ngram LIMIT 50""".stripMargin)),

    // Deterministic ~25% sample of documents by md5-prefix key: the same
    // rows on every engine, every retry.
    QueryDef(
      "x_sample_deterministic",
      (s, d) =>
        Sampling.deterministicSample(Tables.documents(s, d), "doc_id", 0.25)
          .select("doc_id").orderBy("doc_id"),
      Some("""SELECT doc_id FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
             |ORDER BY doc_id""".stripMargin)),

    // Weighted sampling without replacement (Efraimidis-Spirakis A-ES,
    // exponential race): 100 documents drawn proportionally to length.
    // The oracle recomputes the same md5-derived uniforms and arrival
    // times in SQL and takes the same k smallest — the DRAW itself is
    // cross-engine verified, not just the sample-size contract.
    QueryDef(
      "x_weighted_sample",
      (s, d) =>
        Sampling.weightedSample(Tables.documents(s, d), "doc_id", "n_chars",
            k = 100)
          .select(col("doc_id"), col("n_chars"))
          .orderBy("doc_id"),
      Some("""WITH s AS (SELECT doc_id, n_chars,
             |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             |         + 0.5) / 4294967296.0)
             |      / CAST(n_chars AS DOUBLE) AS score
             |  FROM documents),
             |top AS (SELECT doc_id, n_chars FROM s
             |        ORDER BY score, doc_id LIMIT 100)
             |SELECT doc_id, n_chars FROM top ORDER BY doc_id""".stripMargin)),

    // Snapshot diff (CDC view between two catalog versions): removed keys
    // (every 10th), changed rows (price bump below 100), added keys (5
    // synthetic) — one full outer join; the oracle compares VALUES
    // directly while the operator compares content hashes, so hash-equals-
    // value-equality is itself under test.
    QueryDef(
      "x_snapshot_diff",
      (s, d) => {
        val p = Tables.part(s, d)
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        val next = p.filter(col("p_partkey") % 10 =!= 0)
          .select(col("p_partkey"), col("p_name"),
            when(col("p_partkey") < 100, col("p_retailprice") + 1)
              .otherwise(col("p_retailprice")).as("p_retailprice"))
          .union(p.filter(col("p_partkey") < 5)
            .select((col("p_partkey") + 1000000).as("p_partkey"),
              col("p_name"), col("p_retailprice")))
        graft.ops.CatalogOps.snapshotDiff(p, next, "p_partkey",
            Seq("p_name", "p_retailprice"))
          .orderBy("p_partkey")
      },
      Some("""WITH old AS (SELECT p_partkey k, p_name, p_retailprice p
             |            FROM part),
             |neu AS (SELECT p_partkey k, p_name,
             |          CASE WHEN p_partkey < 100 THEN p_retailprice + 1
             |               ELSE p_retailprice END p
             |        FROM part WHERE p_partkey % 10 <> 0
             |        UNION ALL
             |        SELECT p_partkey + 1000000, p_name, p_retailprice
             |        FROM part WHERE p_partkey < 5)
             |SELECT COALESCE(old.k, neu.k) p_partkey,
             |  CASE WHEN old.k IS NULL THEN 'added'
             |       WHEN neu.k IS NULL THEN 'removed'
             |       WHEN old.p_name <> neu.p_name OR old.p <> neu.p
             |         THEN 'changed'
             |       ELSE 'unchanged' END status
             |FROM old FULL OUTER JOIN neu ON old.k = neu.k
             |ORDER BY 1""".stripMargin)),

    // Deterministic ring negative sampling (contrastive-training prep):
    // ids sort by md5 inside 16 hash buckets; row r's j-th negative sits
    // (r+j) mod bucket-size ahead. No global window; the wrap-around is a
    // modular equi-join. The oracle replays the identical walk.
    QueryDef(
      "x_negative_sampling",
      (s, d) =>
        Sampling.ringNegatives(
            Tables.documents(s, d).select("doc_id"), "doc_id", k = 3)
          .orderBy("doc_id", "j"),
      Some("""WITH b AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) h,
             |             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) bucket
             |           FROM documents),
             |p AS (SELECT doc_id, bucket,
             |        row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) rn,
             |        COUNT(*) OVER (PARTITION BY bucket) cnt
             |      FROM b),
             |x AS (SELECT p.*, j FROM p
             |      CROSS JOIN (SELECT unnest(generate_series(1, 3)) j)),
             |t AS (SELECT doc_id, bucket, j,
             |        ((rn - 1 + j) % cnt) + 1 AS target FROM x)
             |SELECT t.doc_id, CAST(t.j AS INT) j, p2.doc_id neg_id
             |FROM t JOIN p p2 ON p2.bucket = t.bucket AND p2.rn = t.target
             |WHERE p2.doc_id <> t.doc_id
             |ORDER BY t.doc_id, j""".stripMargin)),

    // Deterministic 80/10/10 train/val/test split: every document gets
    // exactly one label from its own key hash — rows never migrate between
    // splits as the corpus grows.
    QueryDef(
      "x_train_val_test",
      (s, d) =>
        Sampling.assignSplit(Tables.documents(s, d), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select("doc_id", "split")
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
             |         THEN 'train'
             |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
             |         THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Stratified sampling: class-rebalanced event sample (50% of clicks,
    // 10% of errors, everything else dropped).
    QueryDef(
      "x_sample_stratified",
      (s, d) =>
        Sampling.stratifiedSample(Tables.events(s, d), "event_id",
            "event_type", Map("click" -> 0.5, "error" -> 0.1))
          .select("event_id", "event_type")
          .orderBy("event_id"),
      Some("""SELECT event_id, event_type FROM events
             |WHERE (event_type = 'click'
             |       AND substr(md5(CAST(event_id AS VARCHAR)), 1, 4) < '8000')
             |   OR (event_type = 'error'
             |       AND substr(md5(CAST(event_id AS VARCHAR)), 1, 4) < '199a')
             |ORDER BY event_id""".stripMargin)),

    // Deterministic corpus mixing: upweight one domain (src0 ×2.5),
    // downweight another (src1 ×0.4), keep the rest — copy counts are a
    // pure function of each doc's key (floor(w) copies + one hash-chosen
    // extra for frac(w)), so both engines materialize the identical mix.
    // hexThreshold(0.5) = '8000', hexThreshold(0.4) = '6666'.
    QueryDef(
      "x_corpus_mix",
      (s, d) =>
        Sampling.weightedMix(Tables.documents(s, d), "doc_id", "source",
            Map("src0" -> 2.5, "src1" -> 0.4))
          .select("doc_id", "source", "epoch")
          .orderBy("doc_id", "epoch"),
      Some("""WITH w AS (SELECT doc_id, source,
             |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS k FROM documents),
             |c AS (SELECT doc_id, source,
             |        CASE source
             |          WHEN 'src0' THEN 2 + CAST(k < '8000' AS INT)
             |          WHEN 'src1' THEN CAST(k < '6666' AS INT)
             |          ELSE 1 END AS copies
             |      FROM w)
             |SELECT doc_id, source, unnest(range(0, copies)) AS epoch
             |FROM c WHERE copies > 0 ORDER BY doc_id, epoch""".stripMargin)),

    // Gopher-style within-document repetition signals: duplicate
    // word/bigram/trigram ratios and the top-bigram fraction — ALL per-row
    // state, so the whole query is one codegen'd projection (native n-gram
    // kernels; no shuffle, no join). The pass flag is policy thresholds
    // over the ROUNDED columns, so both engines compare identical 6-dp
    // doubles. The DuckDB oracle computes the same quantities through its
    // list comprehensions + a grouped mode — deliberately a DIFFERENT
    // formulation of the same math.
    QueryDef(
      "x_repetition_signals",
      (s, d) => {
        val sig = TextStats.repetitionSignals(Tables.documents(s, d), "doc_id", "text")
        sig.withColumn("repetition_pass",
            (col("dup_bigram_ratio") < 0.03 && col("top_bigram_frac") < 0.04 &&
              col("n_words") >= 20).cast("int"))
          .orderBy("doc")
      },
      Some("""WITH w AS (SELECT doc_id AS doc, string_split(lower(text), ' ') AS w
             |  FROM documents),
             |b AS (SELECT doc, w,
             |        [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS g2,
             |        [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |         for i in range(1, len(w) - 1)] AS g3
             |      FROM w),
             |rs AS (SELECT doc, CAST(len(w) AS BIGINT) AS n_words,
             |        CAST(round(CAST(CASE WHEN len(w) > 0 THEN
             |          CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w)
             |          ELSE 0.0 END AS DECIMAL(18,12)), 6) AS DOUBLE) AS dup_word_ratio,
             |        CAST(round(CAST(CASE WHEN len(g2) > 0 THEN
             |          CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
             |          ELSE 0.0 END AS DECIMAL(18,12)), 6) AS DOUBLE) AS dup_bigram_ratio,
             |        CAST(round(CAST(CASE WHEN len(g3) > 0 THEN
             |          CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
             |          ELSE 0.0 END AS DECIMAL(18,12)), 6) AS DOUBLE) AS dup_trigram_ratio
             |      FROM b),
             |cnt AS (SELECT doc, g, COUNT(*) AS c
             |        FROM (SELECT doc, unnest(g2) AS g FROM b) GROUP BY 1, 2),
             |tp AS (SELECT doc,
             |         CAST(round(CAST(CAST(max(c) AS DOUBLE) / sum(c)
             |           AS DECIMAL(18,12)), 6) AS DOUBLE) AS top_bigram_frac
             |       FROM cnt GROUP BY 1)
             |SELECT rs.doc, n_words, dup_word_ratio, dup_bigram_ratio,
             |       dup_trigram_ratio,
             |       COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac,
             |       CAST(dup_bigram_ratio < 0.03 AND COALESCE(top_bigram_frac, 0.0) < 0.04
             |            AND n_words >= 20 AS INT) AS repetition_pass
             |FROM rs LEFT JOIN tp USING (doc) ORDER BY rs.doc""".stripMargin)),

    // URL canonicalization + per-registrable-domain corpus stats (the crawl
    // dedup key): scheme/www/query/fragment stripping and the 2-label
    // domain heuristic over a deterministic synthetic URL per document —
    // the same construction on both engines, so the operator under test is
    // the normalization chain, not the data.
    QueryDef(
      "x_url_domain_stats",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val url = concat(
          lit("HTTPS://WWW.a."), col("source"), lit("-"),
          (col("doc_id") % 3).cast("string"), lit(".NET/docs/"),
          col("doc_id").cast("string"), lit("/?utm_source=x&ref=y#frag"))
        val norm = graft.ops.Urls.normalizeUrl(url)
        val domain = graft.ops.Urls.registrableDomain(graft.ops.Urls.host(norm))
        docs.select(col("n_chars"), norm.as("nurl"), domain.as("domain"))
          .groupBy("domain")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("long")).as("total_chars"),
            min(col("nurl")).as("sample_url"))
          .orderBy("domain")
      },
      Some("""WITH u AS (SELECT doc_id, n_chars,
             |    'HTTPS://WWW.a.' || source || '-' || CAST(doc_id % 3 AS VARCHAR)
             |      || '.NET/docs/' || CAST(doc_id AS VARCHAR)
             |      || '/?utm_source=x&ref=y#frag' AS url
             |  FROM documents),
             |n AS (SELECT n_chars,
             |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |      regexp_replace(lower(url), '^[a-z][a-z0-9+.-]*://', ''),
             |      '#.*$', ''), '\?.*$', ''), '^www\.', ''), '/+$', '') AS nurl
             |  FROM u),
             |h AS (SELECT n_chars, nurl,
             |        regexp_replace(nurl, '[/:].*$', '') AS host FROM n),
             |d AS (SELECT n_chars, nurl,
             |        regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain FROM h)
             |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |       min(nurl) AS sample_url
             |FROM d GROUP BY domain ORDER BY domain""".stripMargin)),

    // Corpus-trained unigram-LM quality signal: per-doc cross-entropy and
    // perplexity under the corpus's own token distribution (the CCNet/KenLM
    // LM-filter dataflow with an order-free model).
    QueryDef(
      "x_unigram_ppl",
      (s, d) =>
        TextStats.unigramCrossEntropy(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc"),
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                       x -> len(x) > 0)) AS term
             |  FROM documents),
             |c AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
             |t AS (SELECT SUM(c) AS t FROM c),
             |j AS (SELECT doc, -ln(CAST(c AS DOUBLE) / t) AS nll
             |      FROM toks JOIN c USING (term), t)
             |SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |  round(avg(nll), 6) AS cross_entropy,
             |  round(exp(avg(nll)), 6) AS ppl
             |FROM j GROUP BY doc ORDER BY doc""".stripMargin)),

    // DSIR data selection (importance resampling): per-doc log
    // importance weight under add-0.5-smoothed target-vs-raw unigram
    // models over the union vocabulary; the target domain is the
    // deterministic doc_id%7=0 sample. Selection = rank by weight —
    // the oracle value-locks the weights themselves.
    QueryDef(
      "x_dsir_weights",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Sampling.dsirWeights(docs,
            docs.filter(pmod(col("doc_id"), lit(7)) === 0),
            "doc_id", "text")
          .orderBy("doc")
      },
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                       x -> len(x) > 0)) AS term
             |  FROM documents),
             |tt AS (SELECT term FROM toks WHERE doc % 7 = 0),
             |cr AS (SELECT term, COUNT(*) AS cr FROM toks GROUP BY 1),
             |ct AS (SELECT term, COUNT(*) AS ct FROM tt GROUP BY 1),
             |sc AS (SELECT (SELECT COUNT(*) FROM cr) AS v,
             |              (SELECT SUM(cr) FROM cr) AS tr,
             |              (SELECT COALESCE(SUM(ct), 0) FROM ct) AS tt),
             |j AS (SELECT doc,
             |        ln((COALESCE(ct.ct, 0) + 0.5) / (sc.tt + 0.5 * sc.v))
             |        - ln((cr.cr + 0.5) / (sc.tr + 0.5 * sc.v)) AS lw
             |      FROM toks JOIN cr USING (term)
             |      LEFT JOIN ct USING (term), sc)
             |SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |  round(SUM(lw), 6) AS log_weight
             |FROM j GROUP BY doc ORDER BY doc""".stripMargin)),

    // DSIR's resampling step, deterministic: Gumbel-top-50 over the
    // importance weights — the perturbed-weight top-k that equals
    // sampling-without-replacement ∝ softmax(w). The Gumbel noise is a
    // pure function of (seed, doc) via a 16-bit md5-prefix uniform, so
    // DuckDB draws the IDENTICAL sample (nibbles recovered with
    // position() — no hex-parse builtin needed).
    QueryDef(
      "x_dsir_resample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Sampling.dsirResample(docs,
            docs.filter(pmod(col("doc_id"), lit(7)) === 0),
            "doc_id", "text", n = 50)
          .orderBy("rank")
      },
      Some("""WITH toks AS (SELECT doc_id AS doc,
             |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                       x -> len(x) > 0)) AS term
             |  FROM documents),
             |tt AS (SELECT term FROM toks WHERE doc % 7 = 0),
             |cr AS (SELECT term, COUNT(*) AS cr FROM toks GROUP BY 1),
             |ct AS (SELECT term, COUNT(*) AS ct FROM tt GROUP BY 1),
             |sc AS (SELECT (SELECT COUNT(*) FROM cr) AS v,
             |              (SELECT SUM(cr) FROM cr) AS tr,
             |              (SELECT COALESCE(SUM(ct), 0) FROM ct) AS tt),
             |j AS (SELECT doc,
             |        ln((COALESCE(ct.ct, 0) + 0.5) / (sc.tt + 0.5 * sc.v))
             |        - ln((cr.cr + 0.5) / (sc.tr + 0.5 * sc.v)) AS lw
             |      FROM toks JOIN cr USING (term)
             |      LEFT JOIN ct USING (term), sc),
             |w AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |        round(SUM(lw), 6) AS log_weight
             |      FROM j GROUP BY doc),
             |g AS (SELECT *,
             |        (SELECT SUM((position(substr(h, i, 1)
             |                     IN '0123456789abcdef') - 1)
             |                    * power(16, 4 - i))
             |         FROM range(1, 5) t(i)) AS u16
             |      FROM (SELECT w.*,
             |              md5('dsir' || CAST(doc AS VARCHAR)) AS h
             |            FROM w)),
             |k AS (SELECT doc, n_tokens, log_weight,
             |        round(log_weight
             |          - ln(-ln((u16 + 0.5) / 65536.0)), 6) AS gumbel_key
             |      FROM g)
             |SELECT doc, n_tokens, log_weight, gumbel_key, rank FROM (
             |  SELECT *, row_number()
             |    OVER (ORDER BY gumbel_key DESC, doc) AS rank FROM k)
             |WHERE rank <= 50 ORDER BY rank""".stripMargin)),

    // Order-2 LM quality filter: add-k-smoothed corpus bigram model,
    // per-doc cross-entropy/perplexity — the KenLM/CCNet filter shape
    // (two vocabulary-sized count tables joined back, nothing global).
    QueryDef(
      "x_bigram_ppl",
      (s, d) =>
        TextStats.bigramCrossEntropy(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc"),
      Some("""WITH toksr AS (SELECT doc_id AS doc,
             |    list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                x -> len(x) > 0) AS tl
             |  FROM documents),
             |bi AS (SELECT doc, unnest(tl[1:len(tl)-1]) AS prev,
             |              unnest([tl[i] || ' ' || tl[i+1]
             |                      for i in range(1, len(tl))]) AS bg
             |       FROM toksr WHERE len(tl) >= 2),
             |uni AS (SELECT doc, unnest(tl) AS term FROM toksr),
             |c2 AS (SELECT bg, COUNT(*) AS c2 FROM bi GROUP BY 1),
             |c1 AS (SELECT term AS prev, COUNT(*) AS c1 FROM uni GROUP BY 1),
             |v AS (SELECT COUNT(DISTINCT term) AS v FROM uni),
             |j AS (SELECT doc, -ln((c2 + 0.5) / (c1 + 0.5 * v)) AS nll
             |      FROM bi JOIN c2 USING (bg) JOIN c1 USING (prev), v)
             |SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  round(avg(nll), 6) AS cross_entropy,
             |  round(exp(avg(nll)), 6) AS ppl
             |FROM j GROUP BY doc ORDER BY doc""".stripMargin)),

    // Deterministic size-balanced shard packing (corpus export): shards of
    // ~20000 chars in doc_id order via a distributed exclusive prefix sum.
    QueryDef(
      "x_shard_pack",
      (s, d) =>
        Sampling.packShards(
            Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
            "doc_id", "n_chars", targetPerShard = 20000L)
          .select(col("doc_id"), col("n_chars"), col("shard"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars,
             |  CAST(floor((SUM(n_chars) OVER (ORDER BY doc_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |       - n_chars) / 20000.0) AS BIGINT) AS shard
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // GPT-style sequence packing: docs concatenate in id order into one
    // token stream cut into 512-token context windows; one row per
    // (doc, window) span — windows completely full by construction, docs
    // straddling boundaries contribute to both sides. The prefix sum is
    // the distributed two-pass shape (never a single-partition window);
    // the oracle is the same arithmetic over a SQL running sum.
    QueryDef(
      "x_seq_pack",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("doc_id"),
          size(graft.ops.TextAnalysis.regexTokens(col("text")))
            .cast("long").as("ntok"))
        Sampling.packSequences(toks, "doc_id", "ntok", ctxLen = 512L)
          .orderBy("doc_id", "window")
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
             |                    x -> len(x) > 0)) AS n
             |  FROM documents),
             |s AS (SELECT doc_id, n,
             |        SUM(n) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          - n AS st
             |      FROM toks),
             |w AS (SELECT doc_id, n, st,
             |        unnest(range(CAST(st // 512 AS BIGINT),
             |                     CAST((st + n - 1) // 512 + 1 AS BIGINT))) AS win
             |      FROM s WHERE n > 0)
             |SELECT doc_id, win AS "window",
             |  CAST(greatest(st, win * 512) - st AS BIGINT) AS doc_offset,
             |  CAST(greatest(st, win * 512) - win * 512 AS BIGINT) AS win_offset,
             |  CAST(least(st + n, (win + 1) * 512)
             |    - greatest(st, win * 512) AS BIGINT) AS span_len
             |FROM w ORDER BY doc_id, win""".stripMargin))
  )
}
