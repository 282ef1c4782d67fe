package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.{Dedup, Graph, Temporal}
import org.apache.spark.sql.functions._

/** Time-series joins (as-of, keyed interval), graph clustering (connected
  * components, dedup clusters), and distribution-machinery proofs (salted
  * aggregation, MERGE upsert) — operators Spark lacks as builtins,
  * re-expressed as single-shuffle declarative plans ([[graft.ops.Temporal]])
  * and bounded join-iteration ([[graft.ops.Graph]]). Oracles: DuckDB's
  * native ASOF JOIN / inequality join / recursive-CTE transitive closure /
  * direct-aggregate equivalents — genuinely independent formulations of the
  * same semantics.
  */
object TemporalGraphQueries extends QueryGroup {

  /** Unrolled fixed-iteration PageRank as a DuckDB CTE chain (recursive CTEs
    * can't aggregate in the recursive term, so each Lloyd-style round is its
    * own CTE). Expression shapes mirror [[graft.ops.Graph.pageRank]] exactly
    * — same (1.0 - 0.85) subtraction, same COALESCE(s, 0.0), same per-round
    * round(…, 10) trajectory pinning — so both engines walk the identical
    * rank sequence. */
  private def pageRankOracle(iters: Int): String = {
    val head =
      """WITH e AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) u,
        |                  CAST(l_partkey + 1000000 AS BIGINT) v
        |           FROM lineitem WHERE l_orderkey < 800),
        |verts AS (SELECT u AS id FROM e UNION SELECT v FROM e),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) c FROM verts),
        |outd AS (SELECT u, CAST(COUNT(*) AS BIGINT) od FROM e GROUP BY u),
        |r0 AS (SELECT id, round(1.0 / (SELECT c FROM nn), 10) r FROM verts)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.v AS id, SUM(r${k - 1}.r / outd.od) s
         |      FROM e JOIN outd ON e.u = outd.u
         |             JOIN r${k - 1} ON r${k - 1}.id = e.u GROUP BY e.v),
         |d$k AS (SELECT COALESCE(SUM(r.r), 0.0) dm FROM r${k - 1} r
         |      LEFT JOIN outd ON r.id = outd.u WHERE outd.u IS NULL),
         |r$k AS (SELECT v.id,
         |        round((1.0 - 0.85) / (SELECT c FROM nn)
         |              + 0.85 * (COALESCE(c$k.s, 0.0)
         |                        + (SELECT dm FROM d$k) / (SELECT c FROM nn)),
         |              10) r
         |      FROM verts v LEFT JOIN c$k ON v.id = c$k.id)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT id, round(r, 6) AS pagerank FROM r$iters ORDER BY id"
  }

  /** Unrolled k-core peeling as a DuckDB CTE chain: each round recomputes
    * degrees over the surviving edge set and keeps vertices with degree ≥
    * k. Peeling is monotone, so a chain at least as long as the peel depth
    * produces exactly the converged core. */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    // every CTE is MATERIALIZED: each round references its predecessor
    // twice, and DuckDB's default inlining would re-expand the chain
    // exponentially (measured as a too-many-open-files blowup at 12 rounds)
    val head =
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey o, l_partkey p
        |            FROM lineitem WHERE l_orderkey < 300),
        |e0 AS MATERIALIZED (SELECT DISTINCT CAST(a.p AS BIGINT) u,
        |              CAST(b.p AS BIGINT) v
        |       FROM li a JOIN li b ON a.o = b.o AND a.p < b.p)""".stripMargin
    val peels = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT id, COUNT(*) dg FROM
         |         (SELECT u AS id FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
         |       GROUP BY id),
         |k$i AS MATERIALIZED (SELECT id FROM d$i WHERE dg >= $k),
         |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
         |       WHERE u IN (SELECT id FROM k$i) AND v IN (SELECT id FROM k$i))""".stripMargin
    }
    (head +: peels).mkString(",\n") +
      s"""
         |SELECT id, CAST(COUNT(*) AS BIGINT) core_degree FROM
         |  (SELECT u AS id FROM e$rounds UNION ALL SELECT v FROM e$rounds)
         |GROUP BY id ORDER BY id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // Fixed-iteration PageRank over the order→part bipartite graph (every
    // part vertex is dangling — the mass-redistribution path is exercised
    // on half the graph). 5 rounds, damping 0.85, per-round 10 dp pinning;
    // the oracle walks the same trajectory as an unrolled CTE chain.
    QueryDef(
      "x_pagerank",
      (s, d) => {
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 800)
          .select(col("l_orderkey").cast("long").as("src"),
            (col("l_partkey") + 1000000L).cast("long").as("dst"))
        Graph.pageRank(edges, "src", "dst", iters = 5)
          .select(col("id"), round(col("pagerank"), 6).as("pagerank"))
          .orderBy("id")
      },
      Some(pageRankOracle(5))),

    // Salted two-phase aggregation: identical results to the direct group
    // aggregate (the salt only re-routes the shuffle), proven cross-engine.
    QueryDef(
      "x_salted_agg",
      (s, d) =>
        graft.ops.Skew.saltedCountSum(
            Tables.lineitem(s, d).select(col("l_returnflag"),
              col("l_quantity").cast("decimal(18,2)").as("q")),
            "l_returnflag", col("q"), salts = 8)
          .select(col("l_returnflag"), col("n"),
            col("sum").cast("double").as("sum_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // MERGE-style upsert (CatalogOps.upsert): updated nations take the new
    // comment, unmatched keep theirs, a brand-new key appends.
    QueryDef(
      "s_upsert",
      (s, d) => {
        val base = Tables.nation(s, d)
          .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("v"))
        val updates = base.filter(col("k") < 5)
          .select(col("k"), concat(col("v"), lit("_v2")).as("v"))
          .union(s.range(900, 901).select(col("id").as("k"), lit("NEW").as("v")))
        graft.ops.CatalogOps.upsert(base, updates, "k").orderBy("k")
      },
      Some("""WITH base AS (SELECT CAST(n_nationkey AS BIGINT) k, n_name v FROM nation),
             |updates AS (
             |  SELECT k, v || '_v2' AS v FROM base WHERE k < 5
             |  UNION ALL SELECT 900, 'NEW')
             |SELECT k, v FROM base WHERE k NOT IN (SELECT k FROM updates)
             |UNION ALL SELECT k, v FROM updates
             |ORDER BY k""".stripMargin)),

    // Backward as-of join: each purchase attributed to the user's most
    // recent click within 1 hour (the canonical attribution shape).
    QueryDef(
      "x_asof_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
            col("value"))
        Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts",
            Seq("click_id", "value"), tolerance = Some(expr("INTERVAL 1 HOUR")))
          .select(col("event_id"), col("user_id"),
            col("asof_click_id").as("click_id"),
            round(col("asof_value"), 6).as("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
             |           WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts, event_id AS click_id, value FROM events
             |      WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id,
             |  CASE WHEN p.ts <= c.ts + INTERVAL 1 HOUR THEN c.click_id END
             |    AS click_id,
             |  CASE WHEN p.ts <= c.ts + INTERVAL 1 HOUR THEN round(c.value, 6) END
             |    AS click_value
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY event_id""".stripMargin)),

    // Keyed interval join: every error within 1 hour after a signup by the
    // same user (half-open window), via time-bucketed equi-join.
    QueryDef(
      "x_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id").as("signup_id"),
            col("ts").as("w_start"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
        Temporal.rangeJoin(errors, signups, Seq("user_id"),
            "ts", "w_start", "w_end", bucketSeconds = 3600)
          .select(col("signup_id"), col("event_id"), col("user_id"))
          .orderBy("signup_id", "event_id")
      },
      Some("""SELECT s.event_id AS signup_id, e.event_id, e.user_id
             |FROM (SELECT user_id, event_id, ts FROM events
             |      WHERE event_type = 'signup') s
             |JOIN (SELECT user_id, event_id, ts FROM events
             |      WHERE event_type = 'error') e
             |  ON e.user_id = s.user_id
             | AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 1 HOUR
             |ORDER BY 1, 2""".stripMargin)),

    // Connected components over a synthetic order–part co-occurrence
    // bipartite graph; oracle = recursive-CTE transitive closure.
    QueryDef(
      "x_connected_components",
      (s, d) => {
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 800)
          .select(col("l_orderkey").cast("long").as("src"),
            (col("l_partkey") + 1000000L).cast("long").as("dst"))
        Graph.connectedComponents(edges, "src", "dst", maxIter = 30)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT CAST(l_orderkey AS BIGINT) AS a,
             |         CAST(l_partkey + 1000000 AS BIGINT) AS b
             |  FROM lineitem WHERE l_orderkey < 800),
             |ud AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
             |reach(a, b) AS (
             |  SELECT a, a FROM ud
             |  UNION
             |  SELECT r.a, u.b FROM reach r JOIN ud u ON r.b = u.a),
             |lbl AS (SELECT b AS id, min(a) AS label FROM reach GROUP BY b)
             |SELECT id, CAST(label AS BIGINT) AS label FROM lbl
             |ORDER BY id""".stripMargin)),

    // Same components via alternating large-star/small-star contraction —
    // the O(log n)-round deep-graph tier; identical labels, same oracle.
    QueryDef(
      "x_cc_star",
      (s, d) => {
        val edges = Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 800)
          .select(col("l_orderkey").cast("long").as("src"),
            (col("l_partkey") + 1000000L).cast("long").as("dst"))
        Graph.connectedComponentsStar(edges, "src", "dst")
          .orderBy("id")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT CAST(l_orderkey AS BIGINT) AS a,
             |         CAST(l_partkey + 1000000 AS BIGINT) AS b
             |  FROM lineitem WHERE l_orderkey < 800),
             |ud AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
             |reach(a, b) AS (
             |  SELECT a, a FROM ud
             |  UNION
             |  SELECT r.a, u.b FROM reach r JOIN ud u ON r.b = u.a),
             |lbl AS (SELECT b AS id, min(a) AS label FROM reach GROUP BY b)
             |SELECT id, CAST(label AS BIGINT) AS label FROM lbl
             |ORDER BY id""".stripMargin)),

    // Weekly cohort retention over all events: users cohorted by first
    // active epoch-week, distinct actives per (cohort, offset).
    QueryDef(
      "x_cohort_retention",
      (s, d) =>
        Temporal.cohortRetention(Tables.events(s, d), "user_id", "ts",
            periodSeconds = 604800L)
          .orderBy("cohort", "offset"),
      Some("""WITH act AS (SELECT DISTINCT user_id k,
             |    CAST(floor((epoch_us(ts) // 1000000) / 604800) AS BIGINT)
             |      period
             |  FROM events),
             |c AS (SELECT k, min(period) cohort FROM act GROUP BY k)
             |SELECT c.cohort, act.period - c.cohort AS offset,
             |  CAST(COUNT(DISTINCT act.k) AS BIGINT) AS n_active
             |FROM act JOIN c ON act.k = c.k
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Daily OHLC of purchase values per user: the canonical metered-series
    // downsample. Open/close tie-break on (ts, value) structs mirrors the
    // oracle's row_number ordering exactly.
    QueryDef(
      "x_ohlc_daily",
      (s, d) =>
        Temporal.ohlc(
            Tables.events(s, d).filter(col("event_type") === "purchase"),
            "user_id", "ts", "value", periodSeconds = 86400L)
          .select(col("user_id"), col("period_start"),
            round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
            round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
            col("n_obs"))
          .orderBy("user_id", "period_start"),
      Some("""WITH e AS (SELECT user_id, value,
             |    CAST(floor((epoch_us(ts) // 1000000) / 86400) * 86400 AS BIGINT)
             |      AS period_start,
             |    row_number() OVER (PARTITION BY user_id,
             |        CAST(floor((epoch_us(ts) // 1000000) / 86400) * 86400 AS BIGINT)
             |      ORDER BY epoch_us(ts), value) rn_open,
             |    row_number() OVER (PARTITION BY user_id,
             |        CAST(floor((epoch_us(ts) // 1000000) / 86400) * 86400 AS BIGINT)
             |      ORDER BY epoch_us(ts) DESC, value DESC) rn_close
             |  FROM events WHERE event_type = 'purchase'),
             |o AS (SELECT user_id, period_start,
             |        MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
             |        MAX(value) AS high, MIN(value) AS low,
             |        MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
             |        CAST(COUNT(*) AS BIGINT) AS n_obs
             |      FROM e GROUP BY 1, 2)
             |SELECT user_id, period_start, round(open, 6) AS open,
             |  round(high, 6) AS high, round(low, 6) AS low,
             |  round(close, 6) AS close, n_obs
             |FROM o ORDER BY user_id, period_start""".stripMargin)),

    // Recency-weighted purchase value per user: half-life 7 days at a
    // fixed reference instant; Δt truncates to whole seconds identically
    // on both engines.
    QueryDef(
      "x_decayed_sum",
      (s, d) =>
        Temporal.decayedSum(
            Tables.events(s, d).filter(col("event_type") === "purchase"),
            "user_id", "ts", "value",
            halfLifeSeconds = 604800L,
            refEpochSeconds = 1706745600L) // 2024-02-01 00:00:00 UTC
          .orderBy("user_id"),
      Some("""SELECT user_id,
             |  round(SUM(value * pow(2.0,
             |    -CAST(1706745600 - epoch_us(ts) // 1000000 AS DOUBLE)
             |      / 604800)), 6) AS decayed_sum
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Batch sessionization (gaps-and-islands): a >1 h silence opens a new
    // 0-based session per user. One window pass on (user, ts); gap compare
    // truncates to whole epoch seconds on both engines.
    QueryDef(
      "x_sessionize",
      (s, d) =>
        Temporal.sessionize(Tables.events(s, d), "user_id", "ts",
            gapSeconds = 3600L)
          .select(col("user_id"), col("event_id"), col("session"))
          .orderBy("user_id", "event_id"),
      Some("""WITH e AS (SELECT user_id, event_id, ts,
             |                  epoch_us(ts) // 1000000 AS tsec FROM events),
             |x AS (SELECT user_id, event_id, ts, tsec,
             |        CASE WHEN lag(tsec) OVER
             |               (PARTITION BY user_id ORDER BY ts) IS NULL THEN 0
             |             WHEN tsec - lag(tsec) OVER
             |               (PARTITION BY user_id ORDER BY ts) > 3600 THEN 1
             |             ELSE 0 END AS nw
             |      FROM e),
             |sess AS (SELECT user_id, event_id,
             |        CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ts
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS BIGINT) AS session
             |      FROM x)
             |SELECT user_id, event_id, session FROM sess
             |ORDER BY user_id, event_id""".stripMargin)),

    // Funnel: signup -> first click strictly after it -> first purchase
    // strictly after that, completed within 7 days. Spark side is ONE
    // shuffle + a sorted row-local fold (Temporal.funnel); the oracle is a
    // chain of min-aggregate joins — a genuinely different formulation of
    // the same greedy-earliest semantics. Timestamps compare at micros on
    // both engines.
    QueryDef(
      "x_funnel",
      (s, d) =>
        Temporal.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
            Seq("signup", "click", "purchase"), windowMicros = 604800000000L)
          .select(col("k").as("user_id"), col("step_0_us"), col("step_1_us"),
            col("step_2_us"), col("completed"))
          .orderBy("user_id"),
      Some("""WITH ev AS (SELECT user_id k, epoch_us(ts) t, event_type y
             |            FROM events),
             |s AS (SELECT k, min(t) s FROM ev WHERE y = 'signup' GROUP BY k),
             |c AS (SELECT ev.k, min(ev.t) c FROM ev
             |      JOIN s ON ev.k = s.k AND ev.t > s.s
             |      WHERE ev.y = 'click' GROUP BY ev.k),
             |p AS (SELECT ev.k, min(ev.t) p FROM ev
             |      JOIN c ON ev.k = c.k AND ev.t > c.c
             |      WHERE ev.y = 'purchase' GROUP BY ev.k)
             |SELECT s.k AS user_id, s.s AS step_0_us, c.c AS step_1_us,
             |       p.p AS step_2_us,
             |       (p.p IS NOT NULL AND p.p - s.s <= 604800000000)
             |         AS completed
             |FROM s LEFT JOIN c ON s.k = c.k LEFT JOIN p ON c.k = p.k
             |ORDER BY user_id""".stripMargin)),

    // Daily-grid gap-fill with LOCF over each user's purchase series:
    // unobserved days carry the last purchase value forward and are
    // flagged. Oracle builds the same grid with generate_series and an
    // IGNORE NULLS carry window — no shared machinery.
    QueryDef(
      "x_gapfill_locf",
      (s, d) => {
        val purchases = Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("user_id") < 300)
          .select(col("user_id"), col("ts"), col("value"))
        Temporal.gapFillLocf(purchases, Seq("user_id"), "ts", "value",
            stepSeconds = 86400L)
          .select(col("user_id"), col("slot_ts"),
            round(col("value"), 6).as("value"), col("filled"))
          .orderBy("user_id", "slot_ts")
      },
      Some("""WITH s AS (SELECT user_id,
             |    CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) slot, ts, value
             |  FROM events WHERE event_type = 'purchase' AND user_id < 300),
             |ps AS (SELECT user_id, slot, value FROM (
             |    SELECT user_id, slot, value,
             |      row_number() OVER (PARTITION BY user_id, slot
             |                         ORDER BY ts DESC, value DESC) rn FROM s)
             |  WHERE rn = 1),
             |b AS (SELECT user_id, min(slot) lo, max(slot) hi FROM s GROUP BY user_id),
             |g AS (SELECT user_id, unnest(generate_series(lo, hi, 86400)) slot FROM b),
             |j AS (SELECT g.user_id, g.slot, ps.value
             |      FROM g LEFT JOIN ps ON g.user_id = ps.user_id AND g.slot = ps.slot),
             |f AS (SELECT user_id, slot, value IS NULL AS filled,
             |        last_value(value IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY slot
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) v
             |      FROM j)
             |SELECT user_id, slot AS slot_ts, round(v, 6) AS value, filled
             |FROM f ORDER BY user_id, slot_ts""".stripMargin)),

    // Daily-grid gap-fill with LINEAR INTERPOLATION — the resampling
    // step before training on a regular grid: unobserved days take
    // prev + (next-prev) * elapsed-fraction between the surrounding
    // observations; leading gaps backfill, trailing gaps carry. Pure
    // IEEE arithmetic (no libm) over explicit double casts, so both
    // engines produce identical bits. Oracle: the same grid with
    // IGNORE NULLS windows both directions.
    QueryDef(
      "x_gapfill_interp",
      (s, d) => {
        val purchases = Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("user_id") < 300)
          .select(col("user_id"), col("ts"), col("value"))
        Temporal.gapFillLinear(purchases, Seq("user_id"), "ts", "value",
            stepSeconds = 86400L)
          .select(col("user_id"), col("slot_ts"),
            round(col("value"), 6).as("value"), col("filled"))
          .orderBy("user_id", "slot_ts")
      },
      Some("""WITH s AS (SELECT user_id,
             |    CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) slot, ts, value
             |  FROM events WHERE event_type = 'purchase' AND user_id < 300),
             |ps AS (SELECT user_id, slot, value FROM (
             |    SELECT user_id, slot, value,
             |      row_number() OVER (PARTITION BY user_id, slot
             |                         ORDER BY ts DESC, value DESC) rn FROM s)
             |  WHERE rn = 1),
             |b AS (SELECT user_id, min(slot) lo, max(slot) hi FROM s GROUP BY user_id),
             |g AS (SELECT user_id, unnest(generate_series(lo, hi, 86400)) slot FROM b),
             |j AS (SELECT g.user_id, g.slot, ps.value
             |      FROM g LEFT JOIN ps ON g.user_id = ps.user_id AND g.slot = ps.slot),
             |f AS (SELECT user_id, slot, value, value IS NULL AS filled,
             |        last_value(value IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY slot
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
             |        last_value(CASE WHEN value IS NOT NULL THEN slot END
             |                   IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY slot
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pslot,
             |        first_value(value IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY slot
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nv,
             |        first_value(CASE WHEN value IS NOT NULL THEN slot END
             |                    IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY slot
             |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nslot
             |      FROM j),
             |i AS (SELECT user_id, slot, filled,
             |        CASE WHEN value IS NOT NULL THEN value
             |             WHEN pv IS NULL THEN nv
             |             WHEN nv IS NULL THEN pv
             |             ELSE pv + (nv - pv) *
             |               (CAST(slot - pslot AS DOUBLE) /
             |                CAST(nslot - pslot AS DOUBLE)) END v
             |      FROM f)
             |SELECT user_id, slot AS slot_ts, round(v, 6) AS value, filled
             |FROM i ORDER BY user_id, slot_ts""".stripMargin)),

    // Per-vertex triangle counts over the part co-occurrence graph (parts
    // sharing an order are linked). Spark side runs the degree-oriented
    // wedge-close algorithm (Graph.triangles — bounded out-degree, no hub
    // wedge explosion); the oracle is the direct a<b<c triple self-join,
    // a genuinely different formulation of the same count.
    QueryDef(
      "x_triangle_count",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val a = li.select(col("o"), col("p").as("pa"))
        val b = li.select(col("o"), col("p").as("pb"))
        val edges = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
          .select(col("pa").cast("long").as("src"),
            col("pb").cast("long").as("dst"))
        Graph.triangleCounts(edges, "src", "dst")
          .select(col("id"), col("triangles"))
          .orderBy("id")
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey o, l_partkey p
             |            FROM lineitem WHERE l_orderkey < 300),
             |e AS (SELECT DISTINCT CAST(a.p AS BIGINT) u, CAST(b.p AS BIGINT) v
             |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
             |t AS (SELECT e1.u a, e1.v b, e2.v c
             |      FROM e e1 JOIN e e2 ON e2.u = e1.v
             |                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
             |x AS (SELECT a AS id FROM t
             |      UNION ALL SELECT b FROM t
             |      UNION ALL SELECT c FROM t)
             |SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles
             |FROM x GROUP BY id ORDER BY id""".stripMargin)),

    // Local clustering coefficient over the same co-occurrence graph:
    // 2T/(d(d-1)) per vertex, triangles from the degree-oriented
    // enumeration, oracle from the direct triple join.
    QueryDef(
      "x_clustering_coeff",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val a = li.select(col("o"), col("p").as("pa"))
        val b = li.select(col("o"), col("p").as("pb"))
        val edges = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
          .select(col("pa").cast("long").as("src"),
            col("pb").cast("long").as("dst"))
        Graph.clusteringCoefficient(edges, "src", "dst")
          .orderBy("id")
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey o, l_partkey p
             |            FROM lineitem WHERE l_orderkey < 300),
             |e AS (SELECT DISTINCT CAST(a.p AS BIGINT) u, CAST(b.p AS BIGINT) v
             |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
             |d AS (SELECT id, CAST(COUNT(*) AS BIGINT) degree FROM
             |        (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
             |      GROUP BY id),
             |t AS (SELECT e1.u a, e1.v b, e2.v c
             |      FROM e e1 JOIN e e2 ON e2.u = e1.v
             |                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
             |x AS (SELECT a AS id FROM t
             |      UNION ALL SELECT b FROM t
             |      UNION ALL SELECT c FROM t),
             |tc AS (SELECT id, CAST(COUNT(*) AS BIGINT) triangles FROM x
             |       GROUP BY id)
             |SELECT d.id, d.degree, COALESCE(tc.triangles, 0) AS triangles,
             |  CASE WHEN d.degree >= 2
             |       THEN round(2.0 * COALESCE(tc.triangles, 0)
             |                  / (d.degree * (d.degree - 1)), 6)
             |       ELSE 0.0 END AS coeff
             |FROM d LEFT JOIN tc ON d.id = tc.id ORDER BY d.id""".stripMargin)),

    // Adamic-Adar link prediction over the co-occurrence graph: score
    // non-adjacent pairs by rare common neighbors, hubs (deg > 15) dropped
    // before wedging — the stop-bucket guard, mirrored in the oracle.
    QueryDef(
      "x_adamic_adar",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val a = li.select(col("o"), col("p").as("pa"))
        val b = li.select(col("o"), col("p").as("pb"))
        val edges = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
          .select(col("pa").cast("long").as("src"),
            col("pb").cast("long").as("dst"))
        Graph.adamicAdar(edges, "src", "dst", maxHubDeg = 15)
          .orderBy("u", "v")
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey o, l_partkey p
             |            FROM lineitem WHERE l_orderkey < 300),
             |e AS (SELECT DISTINCT CAST(a.p AS BIGINT) u, CAST(b.p AS BIGINT) v
             |      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
             |sym AS (SELECT u w, v n FROM e UNION ALL SELECT v, u FROM e),
             |dg AS (SELECT w, COUNT(*) dw FROM sym GROUP BY w),
             |f AS (SELECT sym.w, sym.n, dg.dw FROM sym
             |      JOIN dg ON sym.w = dg.w WHERE dg.dw <= 15),
             |wd AS (SELECT a.w, a.n pu, b.n pv, a.dw
             |       FROM f a JOIN f b ON a.w = b.w AND a.n < b.n),
             |sc AS (SELECT pu u, pv v, CAST(COUNT(*) AS BIGINT) common,
             |              round(SUM(1.0 / ln(dw)), 6) score
             |       FROM wd GROUP BY pu, pv)
             |SELECT u, v, common, score FROM sc
             |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = sc.u AND e.v = sc.v)
             |ORDER BY u, v""".stripMargin)),

    // 5-core of the co-occurrence graph by iterative peeling; the oracle
    // unrolls 12 peel rounds as a CTE chain (peeling is monotone, so early
    // convergence equals running them all).
    QueryDef(
      "x_kcore",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val a = li.select(col("o"), col("p").as("pa"))
        val b = li.select(col("o"), col("p").as("pb"))
        val edges = a.join(b, Seq("o")).filter(col("pa") < col("pb"))
          .select(col("pa").cast("long").as("src"),
            col("pb").cast("long").as("dst"))
        Graph.kCore(edges, "src", "dst", k = 5, maxIter = 12)
          .orderBy("id")
      },
      Some(kCoreOracle(k = 5, rounds = 12))),

    // The full dedup-pipeline tail: MinHash+LSH pairs → connected
    // components → one survivor per duplicate cluster.
    QueryDef(
      "x_dedup_clusters",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.select(col("doc_id"), lower(col("text")).as("text"))
          .union(docs.select(
            (col("doc_id") + 100000).as("doc_id"),
            regexp_replace(lower(col("text")), "^[^ ]+ ", "").as("text")))
        val pairs = Dedup.minHashLshPairs(corpus, "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 16, threshold = 0.5)
        Graph.dedupClusters(pairs, "ida", "idb")
          .select(col("cluster").cast("long").as("cluster"),
            col("cluster_size"), col("keep_id").cast("long").as("keep_id"))
          .orderBy("cluster")
      },
      Some("""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, lower(text) AS text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, regexp_replace(lower(text), '^[^ ]+ ', '')
             |  FROM documents),
             |toks AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
             |sh AS (SELECT doc_id,
             |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) s
             |       FROM toks WHERE len(w) >= 3),
             |ex AS (SELECT doc_id, unnest(s) shingle FROM sh),
             |sz AS (SELECT doc_id, COUNT(*) nsh FROM ex GROUP BY doc_id),
             |inter AS (SELECT a.doc_id ida, b.doc_id idb, COUNT(*) c
             |          FROM ex a JOIN ex b ON a.shingle = b.shingle
             |            AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |pairs AS (SELECT ida, idb FROM inter
             |          JOIN sz sa ON sa.doc_id = inter.ida
             |          JOIN sz sb ON sb.doc_id = inter.idb
             |          WHERE CAST(c AS DOUBLE) / (sa.nsh + sb.nsh - c) >= 0.5),
             |ud AS (SELECT ida a, idb b FROM pairs
             |       UNION SELECT idb, ida FROM pairs),
             |reach(a, b) AS (
             |  SELECT a, a FROM ud
             |  UNION
             |  SELECT r.a, u.b FROM reach r JOIN ud u ON r.b = u.a),
             |lbl AS (SELECT b AS id, min(a) AS label FROM reach GROUP BY b)
             |SELECT CAST(label AS BIGINT) AS cluster,
             |  COUNT(*) AS cluster_size,
             |  CAST(min(id) AS BIGINT) AS keep_id
             |FROM lbl GROUP BY label ORDER BY cluster""".stripMargin)),

    // Canonical-document selection: per near-dup cluster keep the BEST
    // member, not the lowest id — here longest text (deterministic
    // tie-break on id), the standard keep-the-most-complete-copy policy.
    // On this corpus every cluster's copies dropped their first word, so
    // the canonical pick must recover exactly the originals.
    QueryDef(
      "x_canonical_pick",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.select(col("doc_id"), lower(col("text")).as("text"))
          .union(docs.select(
            (col("doc_id") + 100000).as("doc_id"),
            regexp_replace(lower(col("text")), "^[^ ]+ ", "").as("text")))
        val pairs = Dedup.minHashLshPairs(corpus, "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 16, threshold = 0.5)
        val labels = Graph.connectedComponents(pairs, "ida", "idb")
        val scored = corpus.select(col("doc_id"), length(col("text")).as("len"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("label")).orderBy(col("len").desc, col("id"))
        labels.join(scored, labels("id") === scored("doc_id"))
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") === 1)
          .select(col("label").cast("long").as("cluster"),
            col("id").cast("long").as("canonical_id"),
            col("len").cast("long").as("canonical_len"))
          .orderBy("cluster")
      },
      Some("""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, lower(text) AS text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, regexp_replace(lower(text), '^[^ ]+ ', '')
             |  FROM documents),
             |toks AS (SELECT doc_id, string_split(text, ' ') w FROM corpus),
             |sh AS (SELECT doc_id,
             |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |                        for i in range(1, len(w) - 1)]) s
             |       FROM toks WHERE len(w) >= 3),
             |ex AS (SELECT doc_id, unnest(s) shingle FROM sh),
             |sz AS (SELECT doc_id, COUNT(*) nsh FROM ex GROUP BY doc_id),
             |inter AS (SELECT a.doc_id ida, b.doc_id idb, COUNT(*) c
             |          FROM ex a JOIN ex b ON a.shingle = b.shingle
             |            AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2),
             |pairs AS (SELECT ida, idb FROM inter
             |          JOIN sz sa ON sa.doc_id = inter.ida
             |          JOIN sz sb ON sb.doc_id = inter.idb
             |          WHERE CAST(c AS DOUBLE) / (sa.nsh + sb.nsh - c) >= 0.5),
             |ud AS (SELECT ida a, idb b FROM pairs
             |       UNION SELECT idb, ida FROM pairs),
             |reach(a, b) AS (
             |  SELECT a, a FROM ud
             |  UNION
             |  SELECT r.a, u.b FROM reach r JOIN ud u ON r.b = u.a),
             |lbl AS (SELECT b AS id, min(a) AS label FROM reach GROUP BY b),
             |mem AS (SELECT lbl.id, lbl.label, len(c.text) AS l
             |        FROM lbl JOIN corpus c ON c.doc_id = lbl.id),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY label ORDER BY l DESC, id) rk FROM mem)
             |SELECT CAST(label AS BIGINT) AS cluster,
             |  CAST(id AS BIGINT) AS canonical_id,
             |  CAST(l AS BIGINT) AS canonical_len
             |FROM r WHERE rk = 1 ORDER BY cluster""".stripMargin))
  )
}
