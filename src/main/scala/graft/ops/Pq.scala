package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) with asymmetric-distance (ADC) search — the
  * memory tier below [[Similarity.quantizeInt8]]: a d-dim float vector
  * stores as m sub-codes (one byte each at k ≤ 256), an m·k·(d/m)-entry
  * codebook reconstructs it, and query-time similarity is m table lookups
  * instead of d multiplies (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011).
  *
  * Scale design: the codebook is DRIVER/BROADCAST-RESIDENT BY CONSTRUCTION
  * (m·k·ds doubles — kilobytes; the same posture as FAISS, where codebooks
  * live in every worker's RAM), so training collects it and encode/search
  * ship it in task closures. Encode and ADC scoring are row-local
  * `mapPartitions` passes over a fully partitioned corpus — no shuffle at
  * all until the final per-query top-k window. The corpus never moves; only
  * codes (m bytes/vector instead of 4·d) are stored, which is the point:
  * at 100 TB of float32 embeddings, PQ at m=8 is a 32× storage cut.
  *
  * Two codebook constructions:
  *  - [[trainKmeans]]: per-subspace deterministic Lloyd (same seeds/pinning
  *    discipline as [[Clustering.kmeansAssign]]) — the real compression
  *    tier, verified by recall specs;
  *  - [[trainDict]]: one centroid per DISTINCT subvector — lossless by
  *    construction, so ADC degenerates to exact search and the whole
  *    encode→table→lookup→rank machinery is oracle-checkable against a
  *    plain SQL cosine (the same degenerate-exact device as the
  *    exhaustive-probe IVF query).
  */
object Pq {

  /** Broadcast-sized PQ codebook: `cents(j)(code)` is the ds-dim centroid
    * for subspace j. Codes are dense 0-based and deterministic (sorted
    * centroid order for [[trainDict]], seed-id rank for [[trainKmeans]]). */
  final case class PqCodebook(m: Int, ds: Int, cents: Array[Array[Array[Double]]])
      extends Serializable {
    def kOf(j: Int): Int = cents(j).length
    require(cents.length == m, "one centroid table per subspace")
  }

  private def dims(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).first().getInt(0)

  private def lexLt(a: Array[Double], b: Array[Double]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      if (a(i) < b(i)) return true
      if (a(i) > b(i)) return false
      i += 1
    }
    a.length < b.length
  }

  /** Lossless dictionary codebook: every distinct subvector of each
    * subspace becomes a centroid (sorted lexicographically → deterministic
    * codes). Collect is gated by `maxCodesPerSub`: the codebook must stay
    * broadcast-sized — a subspace with more distinct subvectors than that
    * needs the k-means tier, not a bigger dictionary. */
  def trainDict(corpus: DataFrame, vecCol: String, m: Int,
      maxCodesPerSub: Int = 1 << 16): PqCodebook = {
    val d = dims(corpus, vecCol)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val ds = d / m
    val v = corpus.select(Similarity.toDouble(col(vecCol)).as("e"))
    val cents = (0 until m).map { j =>
      val subs = v.select(slice(col("e"), j * ds + 1, ds).as("s")).distinct()
        .limit(maxCodesPerSub + 1).collect()
        .map(_.getSeq[Double](0).toArray)
      require(subs.length <= maxCodesPerSub,
        s"subspace $j exceeds maxCodesPerSub=$maxCodesPerSub distinct " +
          "subvectors; use trainKmeans for a bounded codebook")
      subs.sortWith(lexLt)
    }.toArray
    PqCodebook(m, ds, cents)
  }

  /** Per-subspace k-means codebook (the compression tier), trained FUSED:
    * all m subspace Lloyd loops advance together — one slice-explode up
    * front, then per iteration ONE broadcast of all m·k centroids and ONE
    * centroid-update aggregate, instead of m independent loops (8
    * sequential Lloyd runs benched 6.5 s at sf0.1; fused is one loop's
    * worth of jobs). Per subspace the math is exactly
    * [[Clustering.kmeansAssign]]'s: k-smallest-id seeds, dot-expansion
    * distances on bound attributes, (distance, cid) struct argmin, member
    * means pinned to 6 dp through DECIMAL(18,12) — subspaces don't
    * interact, so fusion changes scheduling, not results. Codes are the
    * rank of the seed labels (deterministic). */
  def trainKmeans(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): PqCodebook = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val d = dims(corpus, vecCol)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val ds = d / m
    val r6 = (c: org.apache.spark.sql.Column) =>
      round(c.cast("decimal(18,12)"), 6).cast("double")
    val v = corpus.select(col(idCol).as("id"),
      Similarity.toDouble(col(vecCol)).as("e"))
    val sub = v.select(col("id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("j"), slice(col("e"), j * ds + 1, ds).as("sv"))): _*)).as("s"))
      .select(col("s.j").as("j"), col("id"), col("s.sv").as("sv"))
      .withColumn("sn", Similarity.dot(col("sv"), col("sv")))
      .localCheckpoint(false)
    val seeds = v.orderBy(col("id")).limit(k).select(col("id").as("cid"))
    var cents = sub.join(broadcast(seeds), sub("id") === seeds("cid"))
      .select(col("j"), col("cid"), col("sv").as("ce"))
    for (_ <- 1 to iters) {
      // one m-row broadcast: subspace j's centroid list with cached norms
      val centsRows = cents
        .withColumn("cn", Similarity.dot(col("ce"), col("ce")))
        .groupBy("j")
        .agg(collect_list(struct(col("cid"), col("ce"), col("cn"))).as("cs"))
      val assigned = sub.join(broadcast(centsRows), Seq("j"))
        .withColumn("best", array_min(transform(col("cs"), c =>
          struct(
            (col("sn") - lit(2.0) * Similarity.dot(col("sv"), c.getField("ce"))
              + c.getField("cn")).as("d"),
            c.getField("cid").as("cid")))))
        .select(col("j"), col("best.cid").as("cid"), col("sv"))
      cents = assigned
        .select(col("j"), col("cid"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy("j", "cid", "i").agg(r6(avg(col("x"))).as("mv"))
        .groupBy("j", "cid")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("mv")))),
          s => s.getField("mv")).as("ce"))
    }
    val collected = cents.orderBy("j", "cid").collect()
    val byJ = collected.groupBy(_.getInt(0))
    val tables = (0 until m).map { j =>
      byJ.getOrElse(j, Array.empty[Row]).toArray
        .map(_.getSeq[Double](2).toArray)
    }.toArray
    PqCodebook(m, ds, tables)
  }

  private val codesSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false)),
    StructField("rnorm", DoubleType, nullable = false)))

  /** Encode vectors to PQ codes: per subspace the nearest centroid
    * (squared distance, ties to the smallest code), plus the
    * reconstruction L2 norm (sliced sum, subspace order) needed for
    * cosine at query time. Row-local; shuffle-free. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(codesSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val vecIdx = df.schema.fieldIndex(vecCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val seq = r.getSeq[Number](vecIdx)
        val v = new Array[Double](seq.length)
        var i = 0
        while (i < v.length) { v(i) = seq(i).doubleValue(); i += 1 }
        val codes = new Array[Int](cb.m)
        var nsq = 0.0
        var j = 0
        while (j < cb.m) {
          val off = j * cb.ds
          val table = cb.cents(j)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < table.length) {
            val cent = table(c)
            var dsum = 0.0; var t = 0
            while (t < cb.ds) {
              val diff = v(off + t) - cent(t); dsum += diff * diff; t += 1
            }
            if (dsum < bestD) { bestD = dsum; best = c }
            c += 1
          }
          codes(j) = best
          val chosen = table(best)
          var sq = 0.0; var t = 0
          while (t < cb.ds) { sq += chosen(t) * chosen(t); t += 1 }
          nsq += sq
          j += 1
        }
        Row(r.getLong(idIdx), codes.toSeq, math.sqrt(nsq))
      }
    }(enc)
  }

  private val simSchema = StructType(Seq(
    StructField("q_id", LongType, nullable = false),
    StructField("c_id", LongType, nullable = false),
    StructField("raw", DoubleType, nullable = false)))

  /** ADC cosine top-k: for each query, the k most-similar encoded corpus
    * vectors (self-matches excluded). Per task, each query precomputes its
    * m·k partial-dot table ONCE; every corpus row then scores in m lookups
    * + adds (not d multiplies). Query norms use the same sliced
    * decomposition as the reconstruction norms, so with a lossless
    * codebook the score is the exact sliced cosine. Output mirrors
    * [[Similarity.bruteForceTopK]]: (q_id, c_id, sim rounded to 6 dp
    * before ranking, rn; ties on c_id). */
  def topKAdc(queries: DataFrame, encoded: DataFrame,
      idCol: String, vecCol: String, cb: PqCodebook, k: Int,
      maxQueries: Int = 1 << 16): DataFrame = {
    val spark = queries.sparkSession
    // the query set rides a broadcast (each task owns one ADC table per
    // query), so it is driver-bounded by design — hard-gated like
    // Similarity.nearDupPairsBlocked so an oversized set fails fast
    val collected = queries
      .select(col(idCol).cast("long").as("q_id"),
        Similarity.toDouble(col(vecCol)).as("qv"))
      .limit(maxQueries + 1).collect()
    require(collected.length <= maxQueries,
      s"topKAdc is driver-bounded on the QUERY side: query set exceeds " +
        s"maxQueries=$maxQueries")
    val q = collected.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val bcQ = spark.sparkContext.broadcast(q)
    val bcCb = spark.sparkContext.broadcast(cb)
    val enc = org.apache.spark.sql.Encoders.row(simSchema)
    val scored = encoded.mapPartitions { rows =>
      val cbv = bcCb.value
      val qs = bcQ.value
      // per-task ADC tables: tbl(q)(j)(code) = dot(q_j, cent_{j,code});
      // qn(q) = sqrt(Σ_j dot(q_j, q_j)) — sliced, matching rnorm
      val tables = qs.map { case (_, qv) =>
        Array.tabulate(cbv.m) { j =>
          val off = j * cbv.ds
          cbv.cents(j).map { cent =>
            var s = 0.0; var t = 0
            while (t < cbv.ds) { s += qv(off + t) * cent(t); t += 1 }
            s
          }
        }
      }
      val qn = qs.map { case (_, qv) =>
        var nsq = 0.0
        var j = 0
        while (j < cbv.m) {
          var s = 0.0; var t = 0
          while (t < cbv.ds) { s += qv(j * cbv.ds + t) * qv(j * cbv.ds + t); t += 1 }
          nsq += s; j += 1
        }
        math.sqrt(nsq)
      }
      rows.flatMap { r =>
        val cId = r.getLong(0)
        val codes = r.getSeq[Int](1)
        val rnorm = r.getDouble(2)
        qs.indices.iterator.filter(qi => qs(qi)._1 != cId).map { qi =>
          val tbl = tables(qi)
          var s = 0.0; var j = 0
          while (j < cbv.m) { s += tbl(j)(codes(j)); j += 1 }
          // zero-norm guard: an all-zero query or corpus vector would give
          // 0/0 = NaN, and Spark ranks NaN LARGEST in the desc window —
          // NaN rows would occupy the whole top-k. Cosine vs a zero vector
          // is defined as 0 here (never a neighbor), matching bruteForceTopK
          val den = qn(qi) * rnorm
          Row(qs(qi)._1, cId, if (den == 0.0) 0.0 else s / den)
        }
      }
    }(enc)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    scored.select(col("q_id"), col("c_id"), round(col("raw"), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** ADC shortlist + exact rerank — the production PQ search shape (FAISS's
    * refine step): ADC cheaply ranks the WHOLE corpus from codes, the top
    * `pool` candidates per query fetch their raw vectors (an equi-join on
    * id — only pool·|Q| vectors move, not the corpus), and the final top-k
    * is exact cosine over that shortlist. Compression does the corpus scan,
    * full precision does the final ranking; recall is limited only by the
    * shortlist, not the quantization error. Output shape matches
    * [[Similarity.bruteForceTopK]]. */
  def topKAdcRerank(queries: DataFrame, encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, cb: PqCodebook, k: Int,
      pool: Int = 50): DataFrame = {
    import Similarity.{dot, l2Norm}
    val shortlist = topKAdc(queries, encoded, idCol, vecCol, cb, pool)
      .select(col("q_id"), col("c_id"))
    val c = corpus.select(col(idCol).cast("long").as("c_id"),
        col(vecCol).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
        col(vecCol).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    shortlist.join(c, Seq("c_id")).join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("c_id"),
        round(when(col("qn") === 0 || col("cn") === 0, lit(0.0))
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), 6)
          .as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
