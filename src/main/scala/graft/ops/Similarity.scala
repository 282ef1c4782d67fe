package graft.ops

import graft.expressions.GraftFunctions.graftDot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`), pure DataFrame
  * ops. Dot products run through graft's native codegen'd
  * [[graft.expressions.DotProduct]] expression (sequential fold — the same
  * summation order as the HOF formulation and DuckDB's list_dot_product, so
  * results are bit-identical to the oracle); per-row L2 norms are computed
  * once and reused across all pairs, which keeps the O(n²) stages at one dot
  * product + one divide per pair.
  *
  * Scale design: brute-force top-k is the exact baseline — a broadcast of the
  * (small) query side against a fully partitioned corpus: O(|Q|·|C|·d) flops
  * but zero corpus shuffle, linear in executors. The IVF variant buckets the
  * corpus once by nearest centroid (one shuffle), then probes only `nProbe`
  * cells per query — the standard recall/throughput trade, exact within
  * probed cells.
  */
object Similarity {

  /** Element-wise dot product of two double arrays (native expression). */
  def dot(a: Column, b: Column): Column = graftDot(a, b)

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance (monotone in distance — exact for argmin). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Exact brute-force cosine top-k: for each query vector the k most similar
    * corpus vectors (self-matches excluded). Query side is broadcast; ranking
    * is per-query (partitioned window, no global sort). Similarity is rounded
    * to 6dp *before* ranking so ordering is stable cross-engine/cross-plan;
    * ties break on corpus id.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // raw float arrays ride the join (half the bytes of a double[] cast);
    // DotProduct widens each element exactly, so results are bit-identical
    // to computing over CAST(vec AS DOUBLE[]).
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    // zero-norm guard: cosine vs an all-zero vector is 0 by convention —
    // without it 0/0 = NaN, which Spark ranks LARGEST in the desc window
    val sims = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(when(col("qn") === 0 || col("cn") === 0, lit(0.0))
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))), 6)
          .as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Exact brute-force near-duplicate pairs: all (a<b) pairs with cosine >=
    * threshold. O(n²) flops — the exact baseline; use [[ivfTopK]] or LSH
    * bucketing when n is large. */
  def nearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("ida"), col(vecCol).as("va"))
      .withColumn("na", l2Norm(col("va")))
    val b = df.select(col(idCol).as("idb"), col(vecCol).as("vb"))
      .withColumn("nb", l2Norm(col("vb")))
    val cos = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    // the threshold predicate lives in the join condition AFTER the cheap
    // id test: And short-circuits left-to-right in the generated predicate,
    // so the d-element dot runs for n²/2 ordered pairs, not all n² — letting
    // Catalyst push the filter itself puts the expensive conjunct first
    a.join(b, col("ida") < col("idb") && cos >= threshold)
      .select(col("ida"), col("idb"), cos.as("cos"))
  }

  /** Blocked-matmul near-duplicate pairs: same output as [[nearDupPairs]],
    * imperative tier (SURVEY §2: mapPartitions as last resort — used here
    * because the declarative BNLJ iterates n² joined rows through row
    * plumbing, ~5× slower than a primitive loop at equal flops).
    *
    * DRIVER-BOUNDED small-corpus tier: one side is collected to a broadcast
    * array of primitive vectors, so the corpus must fit driver memory. The
    * collect runs eagerly at plan-construction time and is hard-gated at
    * `maxRows` (collected via limit(maxRows+1), so an oversized corpus fails
    * fast instead of OOMing the driver). Not registered as a SparkEntry
    * query — at scale use [[nearDupPairs]] (exact, distributed) or
    * [[cosineLshPairs]] (blocked, near-exact). Results are bit-identical to
    * [[nearDupPairs]]: same fold order, same norm reuse, same rounding.
    */
  def nearDupPairsBlocked(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      maxRows: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long"), toDouble(col(vecCol)))
    val collected = rows.limit(maxRows + 1).collect()
    require(collected.length <= maxRows,
      s"nearDupPairsBlocked is a driver-bounded tier: corpus exceeds " +
        s"maxRows=$maxRows; use nearDupPairs or cosineLshPairs at scale")
    val gathered = collected.map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray)
    }
    def norm(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val withNorms = gathered.map { case (id, v) => (id, v, norm(v)) }
    val bc = spark.sparkContext.broadcast(withNorms)
    import spark.implicits._
    val ids = rows.select(col(idCol).cast("long")).as[Long]
    // the tight loop pre-filters with a 1e-6 margin on the RAW cosine; the
    // exact threshold test happens on Spark's own round() so rounding
    // semantics are bit-identical to the declarative version
    ids.mapPartitions { it =>
      val block = bc.value
      val byId = block.map(t => t._1 -> t).toMap
      it.flatMap { ida =>
        val (_, va, na) = byId(ida)
        block.iterator.filter(_._1 > ida).flatMap { case (idb, vb, nb) =>
          var s = 0.0; var i = 0
          val n = math.min(va.length, vb.length)
          while (i < n) { s += va(i) * vb(i); i += 1 }
          val raw = s / (na * nb)
          if (raw >= threshold - 1e-6) Some((ida, idb, raw)) else None
        }
      }
    }.toDF("ida", "idb", "raw")
      .select(col("ida"), col("idb"), round(col("raw"), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Distributed block-matmul exact near-duplicate pairs: same output as
    * [[nearDupPairs]] (bit-identical: same element widening, fold order,
    * norm reuse and rounding), but executed as a blocked all-pairs schedule
    * instead of a row-at-a-time BNLJ.
    *
    * Shape: rows are packed into ⌈n/rowsPerBlock⌉ blocks (one hash shuffle),
    * the ⌈B²/2⌉ unordered block pairs are formed by two EQUI-joins against a
    * tiny (B rows) pair-key table — never a cartesian over heavy rows — and
    * each block pair runs a primitive double[] loop over its ≤rowsPerBlock²
    * candidates. Exact all-pairs is Θ(n²·d) flops no matter the plan; what
    * this tier fixes is the constant: the BNLJ iterates every candidate
    * through codegen'd Row plumbing (join-condition eval, per-pair array
    * reads), while the block loop touches primitive arrays unpacked once per
    * block. Communication is n·B/2 vector replications (each block meets
    * B/2 partners) — the standard 1D-blocked GEMM schedule; `rowsPerBlock`
    * trades replication factor against per-task memory (2·rowsPerBlock
    * vectors ≈ a few MB at d=64). Fully distributed: no driver collect, no
    * per-executor corpus copy, B² independent tasks. This is the plan you'd
    * run on a 1000-executor cluster when the EXACT answer is required; when
    * near-exact recall suffices, [[cosineLshPairs]] skips the n² flops
    * entirely.
    */
  def nearDupPairsBlockJoin(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      rowsPerBlock: Int = 2048): DataFrame = {
    require(rowsPerBlock > 0, "rowsPerBlock must be positive")
    val rows = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
    // one scalar count to size the block grid (same pattern as ivfTopK)
    val n = rows.count()
    val nBlocks = math.max(1L, (n + rowsPerBlock - 1) / rowsPerBlock).toInt
    val packed = rows
      .withColumn("__bid", pmod(xxhash64(col("__id")), lit(nBlocks)).cast("int"))
      .groupBy("__bid")
      .agg(collect_list(struct(col("__id"), col("__v"))).as("__items"))
    // unordered block-pair keys from a cartesian over B ints (tiny), then
    // two hash equi-joins attach the heavy packed arrays
    val bids = packed.select(col("__bid"))
    val pairKeys = bids.select(col("__bid").as("__ba"))
      .crossJoin(bids.select(col("__bid").as("__bb")))
      .filter(col("__ba") <= col("__bb"))
    val joined = pairKeys
      .join(packed.select(col("__bid").as("__ba"), col("__items").as("__ia")), Seq("__ba"))
      .join(packed.select(col("__bid").as("__bb"), col("__items").as("__ib")), Seq("__bb"))
      .select(col("__ba"), col("__bb"), col("__ia"), col("__ib"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ida",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("idb",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("raw",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    import org.apache.spark.sql.Row
    val out = joined.mapPartitions { it =>
      // unpack a packed block once: ids, exactly-widened double vectors, norms
      def unpack(items: Seq[Row]): (Array[Long], Array[Array[Double]], Array[Double]) = {
        val m = items.length
        val ids = new Array[Long](m); val vs = new Array[Array[Double]](m)
        val ns = new Array[Double](m)
        var i = 0
        while (i < m) {
          val r = items(i)
          val seq = r.getSeq[Number](1)
          val v = new Array[Double](seq.length)
          var k = 0
          while (k < v.length) { v(k) = seq(k).doubleValue(); k += 1 }
          var s = 0.0; k = 0
          while (k < v.length) { s += v(k) * v(k); k += 1 }
          ids(i) = r.getLong(0); vs(i) = v; ns(i) = math.sqrt(s)
          i += 1
        }
        (ids, vs, ns)
      }
      it.flatMap { pr =>
        val same = pr.getInt(0) == pr.getInt(1)
        val (idsA, vsA, nsA) = unpack(pr.getSeq[Row](2))
        val (idsB, vsB, nsB) = if (same) (idsA, vsA, nsA) else unpack(pr.getSeq[Row](3))
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        var i = 0
        while (i < idsA.length) {
          val va = vsA(i); val na = nsA(i)
          var j = if (same) i + 1 else 0
          while (j < idsB.length) {
            val vb = vsB(j)
            var s = 0.0; var k = 0
            val d = math.min(va.length, vb.length)
            while (k < d) { s += va(k) * vb(k); k += 1 }
            val raw = s / (na * nsB(j))
            // 1e-6 margin prefilter; the exact test happens on Spark's own
            // round() below so rounding semantics match the declarative tier
            if (raw >= threshold - 1e-6 && idsA(i) != idsB(j)) {
              val (lo, hi) =
                if (idsA(i) < idsB(j)) (idsA(i), idsB(j)) else (idsB(j), idsA(i))
              buf += Row(lo, hi, raw)
            }
            j += 1
          }
          i += 1
        }
        buf.iterator
      }
    }(enc)
    out.select(col("ida"), col("idb"), round(col("raw"), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-blocked cosine near-duplicate pairs — the 100 TB tier.
    *
    * Random-hyperplane signatures ([[graft.expressions.HyperplaneBands]],
    * deterministic ±1 planes, no RNG state) are banded into (band, bandHash)
    * bucket keys; only same-bucket pairs are candidates, then every candidate
    * is verified with the exact cosine — so precision is exact and recall is
    * the banding bound 1-(1-(1-θ/π)^r)^b per pair. Shuffles on the bucket
    * key only; hot buckets (near-zero vectors, boilerplate embeddings) are
    * dropped by `maxBucketSize` via a hash-aggregate + anti-join — the same
    * stop-bucket guard as the text MinHash path. No driver collect, no
    * O(n²) stage: candidate volume is Σ_bucket |b|².
    *
    * Banding AUTO-SCALES with corpus size by default (`numPlanes = 0`):
    * bits-per-band r must track log₂(n), or the 2^r band-hash space
    * saturates and RANDOM pairs collide at rate b·2^-r — with a fixed
    * r = 8 the "sub-quadratic" plan silently degrades to Θ(n²/2⁸) false
    * candidates (measured: the 10×-corpus sweep spent its time exactly
    * there). Auto mode counts the corpus (one cheap job), picks the
    * smallest r with expected random collisions ≤ ~50·n, then sizes
    * b = ln(10⁸)/p^r so the per-pair miss probability at `threshold` stays
    * ≤ 1e-8 (p = 1-θ/π). Plane count r·b grows ~log n — the signature
    * pass stays linear while candidates stay near-linear. Explicit
    * `numPlanes`/`bands` override both (fixed-plan benchmarking).
    */
  def cosineLshPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      numPlanes: Int = 0, bands: Int = 0,
      maxBucketSize: Int = 10000, reuseSignatures: Boolean = true): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
    val (nPlanes, nBands) =
      if (numPlanes > 0) {
        (numPlanes, if (bands > 0) bands else math.max(1, numPlanes / 8))
      } else {
        require(threshold > 0.0 && threshold < 1.0,
          s"auto-banded LSH needs threshold in (0,1), got $threshold " +
            "(pass explicit numPlanes/bands to force a fixed plan)")
        val n = math.max(base.count(), 2L).toDouble
        val p = 1.0 - math.acos(math.min(threshold, 1.0)) / math.Pi
        // collision budget ~50 per row: measured at d=64 the exact-cosine
        // verify on excess candidates costs MORE than the wider signature
        // pass that avoids them, at small n as well as large — so no
        // small-n floor; the narrow-band config loses even at sf0.1
        val budget = 50.0 * n
        def sizeB(r: Int): Long =
          math.max(8L, math.ceil(math.log(1e8) / math.pow(p, r)).toLong)
        var r = 8
        var b = sizeB(r)
        while (r < 24 && b * n * n / math.pow(2.0, r) > budget) {
          r += 1
          b = sizeB(r)
        }
        // total-plane cap: b grows as p^-r, so moderate thresholds at large
        // n would otherwise push r·b into the 10^5-10^6 range (the signature
        // pass becomes the bottleneck) and near-0 thresholds overflow Int.
        // When the cap binds we RELAX the 1e-8 per-pair miss target instead
        // — recall degrades gracefully, cost stays bounded.
        val maxTotalPlanes = 4096L
        if (r.toLong * b > maxTotalPlanes) b = math.max(1L, maxTotalPlanes / r)
        ((r * b).toInt, b.toInt)
      }
    // banding carries only (id, band, bh); vectors re-attach after the
    // candidate set has collapsed to verified-size
    val banded0 = base.select(col("__id"),
        posexplode(graft.expressions.GraftFunctions.graftHyperplaneBands(
          col("__v"), nPlanes, nBands)))
      .select(col("__id"), col("pos").as("band"), col("col").as("bh"))
    // the O(d·numPlanes) signature kernel would otherwise re-run on both
    // sides of the bucket self-join AND under the hot-bucket count;
    // materialize the (small: 3 ints × bands per vector) banded table once
    val banded = if (reuseSignatures) banded0.localCheckpoint(false) else banded0
    val capped =
      if (maxBucketSize > 0) {
        val hot = banded.groupBy("band", "bh").count()
          .filter(col("count") > maxBucketSize).select("band", "bh")
        banded.join(hot, Seq("band", "bh"), "left_anti")
      } else banded
    val cand = capped.select(col("band"), col("bh"), col("__id").as("ida"))
      .join(capped.select(col("band"), col("bh"), col("__id").as("idb")),
        Seq("band", "bh"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    val cos = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    cand
      .join(base.select(col("__id").as("ida"), col("__v").as("va"),
        col("__n").as("na")), Seq("ida"))
      .join(base.select(col("__id").as("idb"), col("__v").as("vb"),
        col("__n").as("nb")), Seq("idb"))
      .select(col("ida"), col("idb"), cos.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Symmetric int8 quantization of an embedding column: per-vector scale =
    * max|v|/127, q_i = round(v_i/scale) ∈ [-127,127]. A float32 embedding
    * table shrinks 4× (the dominant storage cost of a 100 TB embedding
    * corpus); cosine error after dequantization is bounded by the
    * quantization step (≲1e-2 at d=64, spec-checked). Zero vectors keep
    * scale 0 and quantize to zeros. Row-local column expressions —
    * shuffle-free.
    *
    * The scale is BOUND once per row through a single-element transform:
    * a lambda body that references an outer expression tree re-evaluates
    * it per element (HOF lambdas are interpreted), so quantizing with the
    * scale tree inline is O(d²) per row — measured 3.4× slower on the
    * registered query at sf0.1, 3.4 s vs 1.0 s (the same generic-lambda
    * lesson as x_repetition_signals, see NOTES.md).
    */
  def quantizeInt8(vec: Column): Column = {
    val v = toDouble(vec)
    val maxAbs = array_max(transform(v, abs(_)))
    val scale = maxAbs / 127.0
    transform(array(scale), s =>
      struct(
        s.as("scale"),
        transform(v, x =>
          when(s === 0.0, lit(0).cast("tinyint"))
            .otherwise(round(x / s).cast("int").cast("tinyint"))).as("q")))
      .getItem(0)
  }

  /** Inverse of [[quantizeInt8]]: q_i · scale as array<double>. Pass an
    * ATTRIBUTE (a materialized column), not the quantizeInt8 tree inline —
    * the lambda reads `quantized` per element, and a tree there re-runs
    * the whole quantization per element (see [[quantizeInt8]]'s note). */
  def dequantizeInt8(quantized: Column): Column =
    transform(quantized.getField("q"),
      q => q.cast("double") * quantized.getField("scale"))

  /** IVF (inverted-file) approximate top-k.
    *
    * Centroids are a deterministic stride-sample of the corpus itself (every
    * `n/nCentroids`-th vector by id order — reproducible, no RNG). Corpus
    * vectors are assigned to their nearest centroid (one broadcast pass +
    * one shuffle on centroid id); each query probes its `nProbe` nearest
    * centroids and reranks exactly within those cells.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("c_id"), toDouble(col(vecCol)).as("cv"))

    // deterministic hash-sample as centroids: ~nCentroids survivors of an
    // id-hash stride filter, then a top-k by id (TakeOrderedAndProject —
    // per-partition heaps, never a global sort/single-partition window)
    val n = c.count()
    val stride = math.max(1L, n / nCentroids)
    val cents = c.filter(pmod(xxhash64(col("c_id")), lit(stride)) === 0)
      .orderBy(col("c_id")).limit(nCentroids)
      .select(col("c_id").as("cent_id"), col("cv").as("centv"))

    // assign corpus rows to nearest centroid (broadcast centroids)
    val assigned = c.join(broadcast(cents))
      .select(col("c_id"), col("cv"), col("cent_id"),
        sqDist(col("cv"), col("centv")).as("d"))
    val wa = Window.partitionBy(col("c_id")).orderBy(col("d"), col("cent_id"))
    val bucketed = assigned.withColumn("__r", row_number().over(wa))
      .filter(col("__r") === 1).select("cent_id", "c_id", "cv")
      .withColumn("cn", l2Norm(col("cv")))

    // probe nProbe nearest centroids per query
    val q = queries.select(col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv"))
    val probes = q.join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("cent_id"),
        sqDist(col("qv"), col("centv")).as("d"))
    val wp = Window.partitionBy(col("q_id")).orderBy(col("d"), col("cent_id"))
    val probed = probes.withColumn("__r", row_number().over(wp))
      .filter(col("__r") <= nProbe).select("q_id", "qv", "cent_id")
      .withColumn("qn", l2Norm(col("qv")))

    // exact rerank within probed cells
    val sims = probed.join(bucketed, Seq("cent_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("sim"))
    val wr = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    sims.withColumn("rn", row_number().over(wr)).filter(col("rn") <= k)
  }
}
