package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Batch-mode exercises of the streaming transforms (Spark's unified model:
  * the identical functions run under Structured Streaming in StreamsSpec
  * with MemoryStream micro-batches + watermarks — not DuckDB-checkable
  * there, so the event-time window semantics are oracle-checked here on the
  * same code path).
  */
object StreamingQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // An ACTUAL micro-batch stream under the oracle gate: events land in
    // the lake over three commits, a graft-lake streaming source
    // (txn-offset exactly-once, LakeStreamSpec) consumes them — one
    // initial load plus two incremental micro-batches — into a memory
    // sink, and the union of the delivered batches must equal the plain
    // batch SQL over the same rows. This pins the source's no-loss,
    // no-duplicate delivery to the DuckDB hash compare, not just specs.
    QueryDef(
      "st_lake_source",
      (s, d) => {
        // initial commit hardlink-copied from the shared template; the
        // mid-stream commits are the incremental delivery under test
        val root = QueryFixtures
          .linkCopy(QueryFixtures.bronzeEventsTemplate(s, d))
        val ev = Tables.events(s, d).select("event_id", "user_id", "value")
        def commit(k: Int): Unit =
          graft.storage.TxnCatalog.commitPartitions(s, root,
            Seq(("ev", s"b$k", ev.filter(pmod(col("event_id"), lit(3)) === k))),
            statsColumns = Seq("event_id"))
        val name = "q_st_lake_source_sink"
        s.catalog.dropTempView(name)
        val q = s.readStream.format("graft-lake")
          .option("root", root).option("table", "ev").load()
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          commit(1); q.processAllAvailable()
          commit(2); q.processAllAvailable()
        } finally q.stop()
        s.table(name).orderBy("event_id", "user_id", "value")
      },
      Some("""SELECT event_id, user_id, value FROM events
             |ORDER BY event_id, user_id, value""".stripMargin)),

    // Trigger.AvailableNow CATCH-UP under the gate — the nightly
    // batch-incremental shape: a 3-txn backlog exists BEFORE the stream
    // starts, the source's admission control
    // (SupportsTriggerAvailableNow) drains it in maxTxnsPerBatch-bounded
    // micro-batches to the goalpost pinned at start, and the query stops
    // by itself. Delivered rows must equal the plain batch SQL, and the
    // drain must actually have been BOUNDED (>= one batch per backlog
    // txn — pinned as a constant column). Without the interface, a v1
    // source's first capped getOffset becomes the final end and the
    // job would stop after ONE increment.
    QueryDef(
      "st_available_now",
      (s, d) => {
        val root = QueryFixtures
          .linkCopy(QueryFixtures.bronzeEventsTemplate(s, d))
        val ev = Tables.events(s, d).select("event_id", "user_id", "value")
        (1 to 2).foreach { k =>
          graft.storage.TxnCatalog.commitPartitions(s, root,
            Seq(("ev", s"b$k",
              ev.filter(pmod(col("event_id"), lit(3)) === k))),
            statsColumns = Seq("event_id"))
        }
        val name = "q_st_available_now_sink"
        s.catalog.dropTempView(name)
        val q = s.readStream.format("graft-lake")
          .option("root", root).option("table", "ev")
          .option("maxTxnsPerBatch", "1").load()
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        val done = try q.awaitTermination(300000L) finally q.stop()
        require(done, "AvailableNow drain must self-terminate")
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        s.table(name)
          .withColumn("bounded_drain", lit(dataBatches >= 3))
          .orderBy("event_id", "user_id", "value")
      },
      Some("""SELECT event_id, user_id, value, TRUE AS bounded_drain
             |FROM events
             |ORDER BY event_id, user_id, value""".stripMargin)),

    // End-to-end MEDALLION hop under the gate: a bronze lake committed in
    // three batches streams through the graft-lake source, transforms,
    // and lands exactly-once in a SILVER lake via Streams.lakeSink (with
    // inline compaction folding mid-stream) — then the silver TABLE
    // itself must hash-equal the plain batch SQL transform. Pins the
    // whole incremental lake->lake path: txn offsets, idempotent batch
    // landing, and maintenance-under-traffic.
    QueryDef(
      "st_medallion",
      (s, d) => {
        // bronze's initial commit hardlink-copied from a template; the
        // MID-STREAM commits below are the incrementality under test
        val bronze = QueryFixtures
          .linkCopy(QueryFixtures.bronzeEventsTemplate(s, d))
        val silver = java.nio.file.Files
          .createTempDirectory("q_meds").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("q_medc").toString
        val ev = Tables.events(s, d).select("event_id", "user_id", "value")
        def commit(k: Int): Unit =
          graft.storage.TxnCatalog.commitPartitions(s, bronze,
            Seq(("ev", s"b$k", ev.filter(pmod(col("event_id"), lit(3)) === k))),
            statsColumns = Seq("event_id"))
        val in = s.readStream.format("graft-lake")
          .option("root", bronze).option("table", "ev").load()
        val refined = in.filter(col("value") >= 0.0)
          .withColumn("value2", col("value") * 2.0)
        val q = Streams.lakeSink(refined, silver, "ev2", ckpt,
          compactEvery = 2, statsColumns = Seq("event_id"))
        try {
          q.processAllAvailable()
          commit(1); q.processAllAvailable()
          commit(2); q.processAllAvailable()
        } finally q.stop()
        graft.storage.TxnCatalog.read(s, silver, "ev2").get
          .orderBy("event_id", "user_id", "value", "value2")
      },
      Some("""SELECT event_id, user_id, value, value * 2.0 AS value2
             |FROM events WHERE value >= 0.0
             |ORDER BY event_id, user_id, value, value2""".stripMargin)),

    // APPLY CHANGES INTO under the oracle gate: a keyed bronze table's
    // row-level CHANGE FEED (readChangeFeed=true) streams through
    // Streams.cdcApplySink into a silver table maintained as the
    // latest-row-per-key projection — initial load, then a delete +
    // re-upsert commit arriving as incremental micro-batches. The
    // silver read must hash-equal the plain latest-state SQL: deleted
    // keys gone, upserted keys at their newest values, everything else
    // untouched. Pins the whole CDC pipeline (feed rendering, final-
    // state reduction, ledgered merge-on-read landing) to DuckDB.
    QueryDef(
      "st_cdc_apply",
      (s, d) => {
        import s.implicits._
        // bronze base hardlink-copied; the delete + upsert commits are
        // the CDC increments under test and stay live per iteration
        val bronze = QueryFixtures
          .linkCopy(QueryFixtures.bronzeCustTemplate(s, d))
        val silver = java.nio.file.Files
          .createTempDirectory("q_cdcas").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("q_cdcac").toString
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val feed = s.readStream.format("graft-lake")
          .option("root", bronze).option("table", "cust")
          .option("readChangeFeed", "true").load()
        val q = graft.streaming.Streams.cdcApplySink(feed, silver,
          "cust", "c_custkey", ckpt, statsColumns = Seq("c_custkey"))
        try {
          q.processAllAvailable()
          // 4242 exists only at sf >= 0.1 — a delete EVENT regardless;
          // both engines adapt identically
          graft.storage.TxnCatalog.deleteKeys(s, bronze, "cust",
            "c_custkey", Seq(21L, 4242L).toDF("c_custkey"))
          graft.storage.TxnCatalog.commitPartitions(s, bronze,
            Seq(("cust", "b=up",
              cust.filter(col("c_custkey") < 20)
                .select(col("c_custkey"),
                  (col("c_acctbal") + 1000.0).as("c_acctbal")))))
          q.processAllAvailable()
        } finally q.stop()
        graft.storage.TxnCatalog.read(s, silver, "cust").get
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM (
             |  SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal
             |  FROM customer WHERE c_custkey < 20
             |  UNION ALL
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_custkey >= 20 AND c_custkey NOT IN (21, 4242))
             |ORDER BY c_custkey""".stripMargin)),

    // STREAM-STREAM INNER JOIN under the oracle gate: two streams over
    // the same bronze lake (one filtered to the probe keys, one full)
    // joined on user_id with symmetric state — each side's arrivals
    // probe the other side's state store, so matches surface whichever
    // side lands first across micro-batches. Rows arrive over an
    // initial load plus two incremental commits per side; the union of
    // emitted matches must equal the plain batch join. No watermark on
    // purpose: state is unbounded-complete, making the join's output
    // set-equal to batch — the production bounded-state variant rides
    // event-time constraints (StreamsSpec).
    QueryDef(
      "st_stream_join",
      (s, d) => {
        val bronze = QueryFixtures
          .linkCopy(QueryFixtures.bronzeEventsTemplate(s, d))
        val ev = Tables.events(s, d).select("event_id", "user_id", "value")
        def commit(k: Int): Unit =
          graft.storage.TxnCatalog.commitPartitions(s, bronze,
            Seq(("ev", s"b$k", ev.filter(pmod(col("event_id"), lit(3)) === k))),
            statsColumns = Seq("event_id"))
        def src() = s.readStream.format("graft-lake")
          .option("root", bronze).option("table", "ev").load()
        val left = src().filter(pmod(col("event_id"), lit(100)) === 0)
          .select(col("event_id").as("l_id"), col("user_id"))
        val right = src()
          .select(col("event_id").as("r_id"), col("user_id"), col("value"))
        val name = "q_st_stream_join_sink"
        s.catalog.dropTempView(name)
        // state partitions sized to the trigger's state volume (~100k
        // rows), NOT the session's batch default: a stream-stream join
        // keeps FOUR state stores per shuffle partition, and each
        // instance pays a fixed per-trigger commit cost — at the
        // session's 32 the join spent ~45 s of cumulative commit work
        // per trigger on kilobytes of state (profiled, NOTES round 10)
        val q = Streams.withStatePartitions(s, 4) {
          left.join(right, "user_id")
            .writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        }
        try {
          q.processAllAvailable()
          commit(1); q.processAllAvailable()
          commit(2); q.processAllAvailable()
        } finally q.stop()
        s.table(name).select("l_id", "user_id", "r_id", "value")
          .orderBy("l_id", "user_id", "r_id", "value")
      },
      Some("""SELECT a.event_id AS l_id, a.user_id AS user_id,
             |  b.event_id AS r_id, b.value
             |FROM events a JOIN events b ON a.user_id = b.user_id
             |WHERE a.event_id % 100 = 0
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    // STREAMING STATEFUL DEDUPE under the oracle gate (the J5 catalog-
    // idempotence upgrade): dropDuplicates over the key column holds
    // first-seen keys in the state store ACROSS micro-batches, so a
    // later commit re-delivering rows already streamed emits nothing
    // for them — blind re-insertion becomes exactly-once survival. The
    // second commit deliberately replays every batch-0 row alongside
    // genuinely-new ones; the sink must equal plain DISTINCT over the
    // union. Duplicate rows are byte-identical, so "first wins" is
    // value-deterministic.
    QueryDef(
      "st_stream_dedupe",
      (s, d) => {
        val bronze = QueryFixtures
          .linkCopy(QueryFixtures.bronzeEventsTemplate(s, d))
        val ev = Tables.events(s, d).select("event_id", "user_id", "value")
        val name = "q_st_stream_dedupe_sink"
        s.catalog.dropTempView(name)
        // single-store stateful op: same state-partition sizing rule as
        // st_stream_join (fixed per-instance commit cost per trigger)
        val q = Streams.withStatePartitions(s, 4) {
          s.readStream.format("graft-lake")
            .option("root", bronze).option("table", "ev").load()
            .dropDuplicates("event_id")
            .writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        }
        try {
          q.processAllAvailable()
          // replay ALL of batch 0 plus the new batch-1 rows
          graft.storage.TxnCatalog.commitPartitions(s, bronze,
            Seq(("ev", "b1", ev.filter(
              pmod(col("event_id"), lit(3)) <= 1))),
            statsColumns = Seq("event_id"))
          q.processAllAvailable()
        } finally q.stop()
        s.table(name).orderBy("event_id", "user_id", "value")
      },
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_id % 3 <= 1
             |ORDER BY event_id, user_id, value""".stripMargin)),

    // APPLY CHANGES ... STORED AS SCD TYPE 2 under the oracle gate: the
    // same bronze change feed as st_cdc_apply, but the silver table keeps
    // the full VERSION HISTORY per key — __valid_from/__valid_to bracket
    // each version by source txn, deletes close without reopening, updates
    // close the old version and open the new one at the update's txn. The
    // bronze fixture's txns are deterministic (template commit = 1, the
    // delete = 2, the upsert = 3), so the oracle can state the expected
    // history literally: v1 rows closed at 3 for updated keys, closed at 2
    // for deleted keys, open v2 rows at 3, untouched keys open since 1.
    QueryDef(
      "st_scd2_apply",
      (s, d) => {
        import s.implicits._
        val bronze = QueryFixtures
          .linkCopy(QueryFixtures.bronzeCustTemplate(s, d))
        val silver = java.nio.file.Files
          .createTempDirectory("q_scd2s").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("q_scd2c").toString
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val feed = s.readStream.format("graft-lake")
          .option("root", bronze).option("table", "cust")
          .option("readChangeFeed", "true").load()
        val q = graft.streaming.Streams.scd2ApplySink(feed, silver,
          "cust", "c_custkey", ckpt, statsColumns = Seq("c_custkey"))
        try {
          q.processAllAvailable()
          graft.storage.TxnCatalog.deleteKeys(s, bronze, "cust",
            "c_custkey", Seq(21L, 4242L).toDF("c_custkey"))
          graft.storage.TxnCatalog.commitPartitions(s, bronze,
            Seq(("cust", "b=up",
              cust.filter(col("c_custkey") < 20)
                .select(col("c_custkey"),
                  (col("c_acctbal") + 1000.0).as("c_acctbal")))))
          q.processAllAvailable()
        } finally q.stop()
        graft.storage.TxnCatalog.read(s, silver, "cust").get
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal"),
            col("__valid_from").as("valid_from"),
            col("__valid_to").as("valid_to"),
            col("__current").as("is_current"))
          .orderBy("c_custkey", "valid_from")
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
             |  CAST(valid_from AS BIGINT) AS valid_from,
             |  CAST(valid_to AS BIGINT) AS valid_to, is_current FROM (
             |  -- updated keys: v1 closed at the upsert txn (3)
             |  SELECT c_custkey, c_acctbal, 1 AS valid_from,
             |         3 AS valid_to, FALSE AS is_current
             |  FROM customer WHERE c_custkey < 20
             |  UNION ALL -- and their open v2 at +1000
             |  SELECT c_custkey, c_acctbal + 1000.0, 3, NULL, TRUE
             |  FROM customer WHERE c_custkey < 20
             |  UNION ALL -- deleted keys: v1 closed at the delete txn (2)
             |  SELECT c_custkey, c_acctbal, 1, 2, FALSE
             |  FROM customer WHERE c_custkey IN (21, 4242)
             |  UNION ALL -- untouched keys: open since the initial load
             |  SELECT c_custkey, c_acctbal, 1, NULL, TRUE
             |  FROM customer
             |  WHERE c_custkey >= 20 AND c_custkey NOT IN (21, 4242))
             |ORDER BY c_custkey, valid_from""".stripMargin)),

    // Tumbling event-time windows over the events table (10-minute buckets,
    // epoch-aligned in both engines).
    QueryDef(
      "st_tumbling_windows",
      (s, d) =>
        Streams.tumblingAgg(Tables.events(s, d), "ts", "10 minutes", "1 hour")
          .orderBy("w_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
             |  time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS w_end,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY w_start, event_type""".stripMargin)),

    // Session windows (2-hour inactivity gap) — oracle via the classic
    // gap-and-island formulation (lag + cumulative session ids); Spark's
    // session end = last event + gap.
    QueryDef(
      "st_session_windows",
      (s, d) =>
        Streams.sessionAgg(Tables.events(s, d), "ts", "2 hours", "1 day")
          .orderBy("user_id", "s_start"),
      Some("""WITH e AS (SELECT user_id, ts, value FROM events),
             |m AS (SELECT user_id, ts, value,
             |        CASE WHEN lag(ts) OVER w IS NULL
             |               OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
             |             THEN 1 ELSE 0 END AS ns
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |s AS (SELECT user_id, ts, value,
             |        SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid
             |      FROM m)
             |SELECT min(ts) AS s_start, max(ts) + INTERVAL 2 HOUR AS s_end,
             |  user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, s_start""".stripMargin)),

    // Sliding windows (30-minute width, 10-minute slide): every event lands
    // in 3 windows; expressed in SQL as a bucket-offset union.
    QueryDef(
      "st_sliding_windows",
      (s, d) =>
        Streams.slidingAgg(Tables.events(s, d), "ts", "30 minutes", "10 minutes", "1 hour")
          .orderBy("w_start", "event_type"),
      Some("""WITH slid AS (
             |  SELECT time_bucket(INTERVAL '10 minutes', ts)
             |           - (k * INTERVAL '10 minutes') AS w_start, event_type
             |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k))
             |SELECT w_start, w_start + INTERVAL '30 minutes' AS w_end,
             |  event_type, COUNT(*) AS n
             |FROM slid GROUP BY 1, 2, 3
             |ORDER BY w_start, event_type""".stripMargin))
  )
}
