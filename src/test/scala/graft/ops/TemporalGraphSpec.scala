package graft.ops

import graft.GraftSuite
import org.apache.spark.sql.functions._

class TemporalGraphSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: latest right row at or before left time; inclusive ties") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:05:00")),
      (3L, "u2", ts("2024-01-01 10:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      ("u1", ts("2024-01-01 09:59:00"), 100L),
      ("u1", ts("2024-01-01 10:05:00"), 200L), // exactly simultaneous with id=2
      ("u2", ts("2024-01-01 10:01:00"), 300L)  // after u2's only left row
    ).toDF("k", "t", "rid")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("rid"))
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(100L))
    assert(out(2L) === Some(200L)) // <= is inclusive: equal time matches
    assert(out(3L) === None)       // nothing at or before → null
  }

  test("asofJoin: tolerance nulls out matches older than the window") {
    val left = Seq((1L, "u", ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val right = Seq(("u", ts("2024-01-01 10:00:00"), 7L)).toDF("k", "t", "rid")
    val unbounded = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("rid"))
      .select("asof_rid").as[Option[Long]].collect().head
    val bounded = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("rid"),
        tolerance = Some(expr("INTERVAL 1 HOUR")))
      .select("asof_rid").as[Option[Long]].collect().head
    assert(unbounded === Some(7L))
    assert(bounded === None) // 2h-old match rejected by 1h tolerance
  }

  test("rangeJoin: half-open [start, end), intervals spanning buckets") {
    val points = Seq(
      (1L, "u", ts("2024-01-01 10:00:00")), // == start → in
      (2L, "u", ts("2024-01-01 11:30:00")), // inside, next hour-bucket
      (3L, "u", ts("2024-01-01 12:00:00")), // == end → out (half-open)
      (4L, "v", ts("2024-01-01 10:30:00"))  // wrong key
    ).toDF("pid", "k", "t")
    val intervals = Seq(
      ("u", 9L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))
    ).toDF("k", "iid", "s", "e")
    val out = Temporal.rangeJoin(points, intervals, Seq("k"), "t", "s", "e",
        bucketSeconds = 3600)
      .select("pid").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("connectedComponents: chain, separate component, self-loop singleton") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, singleton 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L))
      .toDF("src", "dst")
    val out = Graph.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents converges on a long chain within maxIter") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val out = Graph.connectedComponents(edges, "src", "dst", maxIter = 20)
      .as[(Long, Long)].collect()
    assert(out.length === n)
    assert(out.forall(_._2 === 1L), "all chain vertices share the min label")
  }

  test("convergence stats: rounds = diameter + 1 on a path, monotone changed counts") {
    // path 0-1-...-7: label 0 propagates one hop per round, so round k
    // changes vertices k..7 (8-k changes); round 8 confirms the fixpoint
    val edges = (0 until 7).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val (labels, stats) = Graph.connectedComponentsWithStats(edges, "src", "dst")
    assert(labels.as[(Long, Long)].collect().forall(_._2 === 0L))
    assert(stats.converged)
    assert(stats.rounds === 8) // diameter 7 + one zero-change round
    assert(stats.perRound === Seq(7L, 6L, 5L, 4L, 3L, 2L, 1L, 0L))

    // hitting maxIter on a deeper chain must report converged = false
    val (_, truncated) = Graph.connectedComponentsWithStats(edges, "src", "dst", maxIter = 3)
    assert(!truncated.converged && truncated.rounds === 3)

    // star tier: stats report rounds and surviving-edge counts
    val (slabels, sstats) = Graph.connectedComponentsStarWithStats(edges, "src", "dst")
    assert(slabels.as[(Long, Long)].collect().forall(_._2 === 0L))
    assert(sstats.converged)
    assert(sstats.rounds <= 5, "star contraction is O(log n) rounds")
    assert(sstats.perRound.last === 7L) // final star: 7 spokes to the root
  }

  test("connectedComponentsStar equals propagation on random graphs and chains") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toDF("src", "dst")
      val prop = Graph.connectedComponents(edges, "src", "dst", maxIter = 60)
        .as[(Long, Long)].collect().toMap
      val star = Graph.connectedComponentsStar(edges, "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(star === prop, s"trial $trial")
    }
    // a 60-hop chain: worst case for propagation, logarithmic for star
    val chain = (1 until 60).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val out = Graph.connectedComponentsStar(chain, "src", "dst")
      .as[(Long, Long)].collect()
    assert(out.length === 60 && out.forall(_._2 === 1L))
  }

  test("connectedComponentsStar: self-loop singleton and two components") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L)).toDF("src", "dst")
    val out = Graph.connectedComponentsStar(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L))
  }

  test("dedupClusters: cluster sizes and survivors from pair rows") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("ida", "idb")
    val out = Graph.dedupClusters(pairs, "ida", "idb")
      .select("cluster", "cluster_size", "keep_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 3L, 1L), (7L, 2L, 7L)))
  }

  test("funnel: greedy earliest chain, strict ordering, window gate, stalls are null") {
    val ev = Seq(
      // u1 completes: signup 10:00, click 10:05, purchase 10:10
      ("u1", ts("2024-01-01 10:00:00"), "signup"),
      ("u1", ts("2024-01-01 09:00:00"), "click"),    // click BEFORE signup: ignored
      ("u1", ts("2024-01-01 10:05:00"), "click"),
      ("u1", ts("2024-01-01 10:10:00"), "purchase"),
      // u2 stalls after click (no purchase)
      ("u2", ts("2024-01-02 08:00:00"), "signup"),
      ("u2", ts("2024-01-02 08:30:00"), "click"),
      // u3 purchases before clicking: purchase must not count
      ("u3", ts("2024-01-03 12:00:00"), "signup"),
      ("u3", ts("2024-01-03 12:10:00"), "purchase"),
      ("u3", ts("2024-01-03 12:20:00"), "click"),
      // u4 never signs up: dropped entirely
      ("u4", ts("2024-01-04 09:00:00"), "click")
    ).toDF("u", "t", "y")
    val out = Temporal.funnel(ev, "u", "t", "y",
        Seq("signup", "click", "purchase"), windowMicros = 86400000000L)
      .select("k", "step_0_us", "step_1_us", "step_2_us", "completed")
      .as[(String, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    def us(s: String) = ts(s).getTime * 1000L
    assert(out("u1") === (("u1", Some(us("2024-01-01 10:00:00")),
      Some(us("2024-01-01 10:05:00")), Some(us("2024-01-01 10:10:00")), true)))
    assert(out("u2") === (("u2", Some(us("2024-01-02 08:00:00")),
      Some(us("2024-01-02 08:30:00")), None, false)))
    assert(out("u3")._4 === None && !out("u3")._5) // early purchase ignored
    assert(!out.contains("u4"))
  }

  test("sessionize: gaps over the threshold open new 0-based sessions per key") {
    val ev = Seq(
      ("u1", 1L, ts("2024-01-01 10:00:00")),
      ("u1", 2L, ts("2024-01-01 10:30:00")),  // 30 min: same session
      ("u1", 3L, ts("2024-01-01 12:00:00")),  // 90 min gap: new session
      ("u1", 4L, ts("2024-01-01 12:59:00")),
      ("u2", 5L, ts("2024-01-01 09:00:00"))   // other key restarts at 0
    ).toDF("u", "id", "t")
    val out = Temporal.sessionize(ev, "u", "t", gapSeconds = 3600L)
      .select("id", "session").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("funnel window gate fails a chain completing outside the window") {
    val ev = Seq(
      ("u", ts("2024-01-01 10:00:00"), "a"),
      ("u", ts("2024-01-01 10:30:00"), "b")
    ).toDF("u", "t", "y")
    // 10-minute window: both steps reached, but 30 min apart => not completed
    val r = Temporal.funnel(ev, "u", "t", "y", Seq("a", "b"),
        windowMicros = 600000000L)
      .select("completed").as[Boolean].collect().head
    assert(!r)
  }

  test("gapFillLocf: gaps carry the last value forward and are flagged") {
    // user A: days 0 and 2 observed (day 1 is a gap); day 0 has two
    // observations — the later one (value 20) must win the slot.
    // user B: a single day (no gaps, no fill).
    val obs = Seq(
      ("A", ts("2024-01-01 08:00:00"), 10.0),
      ("A", ts("2024-01-01 17:00:00"), 20.0),
      ("A", ts("2024-01-03 09:00:00"), 30.0),
      ("B", ts("2024-01-05 12:00:00"), 99.0)
    ).toDF("k", "t", "v")
    val out = Temporal.gapFillLocf(obs, Seq("k"), "t", "v", 86400L)
      .select("k", "slot_ts", "v", "filled")
      .as[(String, Long, Double, Boolean)].collect().sortBy(r => (r._1, r._2))
    val day0 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(out.toSeq === Seq(
      ("A", day0, 20.0, false),
      ("A", day0 + 86400, 20.0, true),   // gap: carried, flagged
      ("A", day0 + 2 * 86400, 30.0, false),
      ("B", day0 + 4 * 86400, 99.0, false)))
  }

  test("pageRank: symmetric 2-cycle stays uniform at 0.5; mass is conserved") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(cyc, "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 0.5) < 1e-9 && math.abs(r(2L) - 0.5) < 1e-9)
  }

  test("pageRank: dangling sinks keep total mass 1; sink outranks its sources") {
    // star into a sink: 1..4 -> 9; 9 has no out-edges (dangling path)
    val star = (1L to 4L).map(v => (v, 9L)).toDF("src", "dst")
    val r = Graph.pageRank(star, "src", "dst", iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass not conserved: ${r.values.sum}")
    assert((1L to 4L).forall(v => r(9L) > r(v)))
    // the four symmetric sources tie exactly (identical pinned trajectories)
    assert((2L to 4L).forall(v => r(v) === r(1L)))
  }

  test("clusteringCoefficient: clique vertices 1.0, bridge lowers, pendant 0") {
    // K3 {1,2,3} + pendant 4 on vertex 3
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.clusteringCoefficient(g, "src", "dst")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((2L, 1L, 1.0)))
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L) === ((3L, 1L, round2(2.0 / 6.0)))) // deg 3, 1 triangle
    assert(out(4L) === ((1L, 0L, 0.0)))
  }

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("adamicAdar: scores non-adjacent pairs by rare common neighbors only") {
    // path 1-3-2 plus 1-4-2: pair (1,2) has common neighbors {3,4};
    // deg(3)=deg(4)=2 => score = 2/ln(2); (1,2) is NOT an edge
    val g = Seq((1L, 3L), (3L, 2L), (1L, 4L), (4L, 2L)).toDF("src", "dst")
    val out = Graph.adamicAdar(g, "src", "dst")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((1L, 2L))._1 === 2L)
    assert(math.abs(out((1L, 2L))._2 - 2.0 / math.log(2.0)) < 1e-5)
    // (3,4) share {1,2} the same way
    assert(out((3L, 4L))._1 === 2L)
    // adjacent pairs are excluded
    assert(!out.contains((1L, 3L)))
  }

  test("kCore peels cascades: a tail hanging off a clique dissolves entirely") {
    // K4 {1,2,3,4} + chain 4-5-6: at k=2 the chain peels in cascade
    // (6 first, then 5), leaving exactly the K4 with in-core degree 3
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core2 = Graph.kCore(g, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core2 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max core: everything peels
    assert(Graph.kCore(g, "src", "dst", k = 4).count() === 0L)
  }

  test("kCore fails fast when peeling has not converged; WithStats exposes the state") {
    // a 12-vertex path at k=2 peels one vertex per END per round — needs
    // ~5 rounds to empty. maxIter=2 leaves a strict superset of the true
    // (empty) 2-core: kCore must throw rather than return it silently
    val path = (1L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.kCore(path, "src", "dst", k = 2, maxIter = 2).count()
    }
    assert(e.getMessage.contains("did not converge"))
    val (partial, stats) =
      Graph.kCoreWithStats(path, "src", "dst", k = 2, maxIter = 2)
    assert(!stats.converged && stats.rounds === 2)
    assert(partial.count() > 0L) // the unconverged superset, explicitly opted into
    // with enough rounds the same graph converges to the true empty core
    val (full, okStats) =
      Graph.kCoreWithStats(path, "src", "dst", k = 2, maxIter = 12)
    assert(okStats.converged && full.count() === 0L)
    // degenerate guard: maxIter=0 on a graph that already IS its own
    // k-core (K4 at k=2) must report converged via the final degree probe
    // rather than throwing on the unobserved fixpoint
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val noIter = Graph.kCore(k4, "src", "dst", k = 2, maxIter = 0)
    assert(noIter.count() === 4L)
    // ...but an UNconverged graph at maxIter=0 still fails fast
    intercept[IllegalArgumentException] {
      Graph.kCore(path, "src", "dst", k = 2, maxIter = 0).count()
    }
  }

  test("cohortRetention: first period defines the cohort; offsets count distinct actives") {
    val wk = 604800L
    def t(week: Long) = new java.sql.Timestamp(week * wk * 1000L)
    val ev = Seq(
      ("a", t(2800)), ("a", t(2801)), ("a", t(2801)), // cohort 2800, offsets 0,1 (dup collapsed)
      ("b", t(2800)), ("b", t(2802)),                 // cohort 2800, offsets 0,2
      ("c", t(2801))                                  // cohort 2801, offset 0
    ).toDF("u", "ts")
    val out = Temporal.cohortRetention(ev, "u", "ts", wk)
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (2800L, 0L, 2L), (2800L, 1L, 1L), (2800L, 2L, 1L), (2801L, 0L, 1L)))
  }

  test("decayedSum: half-life semantics — one half-life halves the weight") {
    val ref = ts("2024-01-08 00:00:00").getTime / 1000 // epoch seconds
    val ev = Seq(
      ("u", ts("2024-01-08 00:00:00"), 10.0),  // Δt=0: weight 1
      ("u", ts("2024-01-01 00:00:00"), 8.0),   // Δt=7d: weight 1/2
      ("w", ts("2024-01-07 00:00:00"), 4.0)    // Δt=1d: weight 2^(-1/7)
    ).toDF("k", "t", "v")
    val out = Temporal.decayedSum(ev, "k", "t", "v",
        halfLifeSeconds = 604800L, refEpochSeconds = ref)
      .as[(String, Double)].collect().toMap
    assert(math.abs(out("u") - (10.0 + 4.0)) < 1e-6)
    assert(math.abs(out("w") - 4.0 * math.pow(2.0, -1.0 / 7.0)) < 1e-5)
  }

  test("triangles: K4 yields all 4 canonical triples; paths and stars yield none") {
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles, duplicate/reversed/self edges ignored
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 3L)).toDF("src", "dst")
    val tris = Graph.triangles(k4, "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(tris === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // triangle-free graphs: a path and a hub star (the skew case the
    // degree orientation exists for) both produce zero rows
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangles(path, "src", "dst").count() === 0L)
    val star = (2L to 40L).map(v => (1L, v)).toDF("src", "dst")
    assert(Graph.triangles(star, "src", "dst").count() === 0L)
  }

  test("triangleCounts: each K4 vertex sits in 3 triangles; pendant vertex in none") {
    val k4plus = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L)).toDF("src", "dst") // 9 is pendant: no triangle
    val counts = Graph.triangleCounts(k4plus, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
