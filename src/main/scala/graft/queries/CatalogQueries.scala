package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.CatalogOps
import org.apache.spark.sql.functions._

/** Catalog-maintenance queries (SURVEY.md S5/S11/S12, J1 literal form) —
  * the reference's MySQL-side mutations exercised through [[CatalogOps]]
  * over catalog-shaped projections of the test lake.
  */
object CatalogQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // J1 in its literal schema: PROC_EJECUCION ⋈ DETALLE_EJECUCION ⋈ CATALOG
    // (mysql_process.py:64-81) over catalog-shaped projections.
    QueryDef(
      "s_urllist_literal",
      (s, d) => {
        val pe = Tables.region(s, d).select(
          col("r_regionkey").cast("long").as("ID_EJECUCION"),
          (col("r_regionkey") % 3).cast("int").as("ID_PROCESO"))
        val de = Tables.nation(s, d).select(
          col("n_regionkey").cast("long").as("ID_EJECUCION"),
          col("n_nationkey").cast("long").as("ID_IMAGEN_FUENTE"))
        val cat = Tables.customer(s, d).select(
          col("c_custkey").as("ID"),
          col("c_mktsegment").as("INDICE"),
          (col("c_custkey") % 4).cast("int").as("ID_TIPO_IMG"),
          concat(lit("lake/"), col("c_name")).as("RUTA_RESULTADO"))
        CatalogOps.getUrlList(pe, de, cat,
            idProceso = 1, tipoImgs = Seq(0, 3), indice = "AUTOMOBILE")
          .orderBy("ID")
      },
      Some("""WITH pe AS (SELECT r_regionkey AS id_ejecucion,
             |              r_regionkey % 3 AS id_proceso FROM region),
             |de AS (SELECT n_regionkey AS id_ejecucion,
             |         n_nationkey AS id_imagen_fuente FROM nation),
             |cat AS (SELECT c_custkey AS id, c_mktsegment AS indice,
             |          c_custkey % 4 AS id_tipo_img,
             |          'lake/' || c_name AS ruta FROM customer)
             |SELECT CAST(cat.id AS BIGINT) AS ID, cat.ruta AS RUTA_RESULTADO
             |FROM pe JOIN de ON pe.id_ejecucion = de.id_ejecucion
             |        JOIN cat ON de.id_imagen_fuente = cat.id
             |WHERE pe.id_proceso = 1 AND cat.id_tipo_img IN (0, 3)
             |  AND cat.indice = 'AUTOMOBILE'
             |ORDER BY ID""".stripMargin)),

    // S11: deterministic batch key assignment (max+row_number).
    QueryDef(
      "s11_assign_keys",
      (s, d) =>
        CatalogOps.assignIds(
            Tables.orders(s, d).select(col("o_orderkey").as("ID")), "ID",
            Tables.customer(s, d).select("c_custkey", "c_name"), "c_custkey")
          .select(col("ID"), col("c_custkey"))
          .orderBy("ID"),
      Some("""SELECT (SELECT max(o_orderkey) FROM orders)
             |         + row_number() OVER (ORDER BY c_custkey) AS ID,
             |       c_custkey
             |FROM customer ORDER BY ID""".stripMargin)),

    // S12: UPDATE…WHERE as read-modify-overwrite over an id list.
    QueryDef(
      "s12_update_where",
      (s, d) =>
        CatalogOps.updateWhere(
            Tables.orders(s, d).select(col("o_orderkey").as("ID"),
              col("o_orderstatus").as("STATUS")),
            "ID", Seq(1L, 5L, 10L, 100L, 1000L), "STATUS", lit("X"))
          .orderBy("ID"),
      Some("""SELECT o_orderkey AS ID,
             |  CASE WHEN o_orderkey IN (1, 5, 10, 100, 1000)
             |       THEN 'X' ELSE o_orderstatus END AS STATUS
             |FROM orders ORDER BY ID""".stripMargin)),

    // Storage round trip: commit append-order batches (each spanning the
    // full range of both columns — neither dimension prunable), Z-order
    // cluster them with TxnCatalog.clusterPartitions, then answer a range
    // predicate through readWhere's manifest-stat skipping. The oracle is
    // the plain filter over the source table: the whole
    // commit→cluster→prune→read path must be value-lossless.
    QueryDef(
      "s_zorder_skipping",
      (s, d) => {
        // shared cached lake (QueryFixtures.custZLake): the FIRST caller
        // in the process runs the full commit->cluster build; sharers
        // (s_catalyst_skipping) and later bench iterations measure the
        // pruned READ the query is about, not repeated construction
        val root = QueryFixtures.custZLake(s, d)
        graft.storage.TxnCatalog.snapshot(s, root).get
          .readWhere("cust", "c_acctbal", 1000.0, 3000.0).get
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE c_acctbal BETWEEN 1000.0 AND 3000.0
             |ORDER BY c_custkey""".stripMargin)),

    // DECLARED WRITE SORT ORDER (Iceberg's write.sort-order +
    // distribution-mode=range): the table carries graft.sort-columns /
    // graft.sort-mode=global, so every commit range-partitions and
    // sorts its staged rows at the publish chokepoint — row-group
    // min/max tight from BIRTH, no OPTIMIZE pass needed. Three
    // arrival-order batches land, the per-file sortedness of every
    // post-create file is verified from _metadata (pinned as a
    // constant column), and the answer is a range read through the
    // manifest stats the sorted layout produced — value-lossless vs
    // the plain filter.
    QueryDef(
      "s_sort_order",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("sortord").toFile.getAbsolutePath
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        graft.storage.TxnCatalog.createTableWithProperties(s, root,
          "cust", "b0", cust.filter(pmod(col("c_custkey"), lit(4)) === 0),
          Map(graft.storage.TxnCatalog.SortColumnsProp -> "c_acctbal",
            graft.storage.TxnCatalog.SortModeProp -> "global",
            graft.storage.TxnCatalog.StatsColumnsProp -> "c_acctbal"))
        (1 to 3).foreach { k =>
          graft.storage.TxnCatalog.commitPartitions(s, root,
            Seq(("cust", s"b$k",
              cust.filter(pmod(col("c_custkey"), lit(4)) === k))))
        }
        // every post-create file must be internally sorted by the
        // declared column (the birth batch predates the property txn)
        val facts = graft.storage.TxnCatalog.read(s, root, "cust").get
          .select(col("c_acctbal"),
            col("_metadata.file_path").as("f"),
            col("_metadata.row_index").as("pos"))
          .filter(!col("f").contains("/b0/"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("f").orderBy("pos")
        val allSorted = facts
          .withColumn("prev", lag("c_acctbal", 1).over(w))
          .filter(col("prev") > col("c_acctbal")).isEmpty
        graft.storage.TxnCatalog.snapshot(s, root).get
          .readWhere("cust", "c_acctbal", 1000.0, 3000.0).get
          .select("c_custkey", "c_acctbal")
          .withColumn("write_sorted", lit(allSorted))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, TRUE AS write_sorted
             |FROM customer WHERE c_acctbal BETWEEN 1000.0 AND 3000.0
             |ORDER BY c_custkey""".stripMargin)),

    // DYNAMIC file pruning (Databricks DFP at partition grain): the
    // fact side's pruning keys exist only at RUNTIME — a dimension
    // frame's filter output — not in any literal predicate.
    // readSemiJoin runs the dim job first, pulls its distinct keys
    // (driver-sized, broadcast-threshold bet), probes them against the
    // Z-tiles' c_custkey stats, and reads only the surviving
    // partitions; the oracle is the plain IN-subquery semi join.
    QueryDef(
      "s_dfp_semi_join",
      (s, d) => {
        val root = QueryFixtures.custZLake(s, d) // shared cached lake
        val dim = Tables.orders(s, d)
          .filter(col("o_totalprice") > 450000.0).select("o_custkey")
        graft.storage.TxnCatalog.snapshot(s, root).get
          .readSemiJoin("cust", "c_custkey", dim, "o_custkey").get
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE c_custkey IN
             |  (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Storage round trip: point lookup on a key whose per-batch ranges
    // all overlap (pmod split), routed by the manifest Bloom recorded at
    // commit — readWhereEq must return exactly the SQL equality filter.
    QueryDef(
      "s_bloom_point_lookup",
      (s, d) => {
        val root = QueryFixtures.partsBloomLake(s, d) // shared cached lake
        graft.storage.TxnCatalog.snapshot(s, root).get
          .readWhereEq("parts", "p_partkey", 42L).get
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey = 42 ORDER BY p_partkey""".stripMargin)),

    // Storage round trip for ID-LIST fetches (the reference's
    // `WHERE ID IN (...)` shape, P2): overlapping-range batches, each
    // probe value routed by the manifest Bloom, the union of owners
    // scanned — readWhereIn must return exactly the SQL IN filter. One
    // value is absent at every SF (prunes everywhere), one exists only
    // at sf >= 0.1: the result adapts to the lake like the oracle does.
    QueryDef(
      "s_in_skipping",
      (s, d) => {
        val root = QueryFixtures.partsBloomLake(s, d) // shared cached lake
        graft.storage.TxnCatalog.snapshot(s, root).get
          .readWhereIn("parts", "p_partkey", Seq(42L, 77L, 4242L, -1L)).get
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey IN (42, 77, 4242, -1)
             |ORDER BY p_partkey""".stripMargin)),

    // Storage round trip on the TIMESTAMP axis — the most common fact-
    // table predicate: commit events in hash-split batches (every batch
    // spans the whole month, so arrival-order stats prune nothing),
    // Z-cluster on (user_id, ts) with ts in the high Z-bits, then answer
    // a time-window read through readWhere's kind-"t" (unix-micros)
    // manifest stats. filesPerBucket=2 routes the write through the
    // range-partitioned multi-file bucket path. The bounds are fixed
    // UTC INSTANTS (not zone-local parses), matching the pinned-UTC
    // session under which Tables.events normalizes every driver ts
    // layout — this query keeps that normalization under the hash gate.
    QueryDef(
      "s_ts_skipping",
      (s, d) => {
        // commit->cluster baked into the cached fixture (the build
        // mutates, the reads don't); iterations measure the pruned
        // time-window read the query is about
        val root = QueryFixtures.eventsTsLake(s, d)
        def utc(iso: String) =
          java.sql.Timestamp.from(java.time.Instant.parse(iso))
        graft.storage.TxnCatalog.snapshot(s, root).get
          .readWhere("ev", "ts",
            utc("2024-01-10T00:00:00Z"), utc("2024-01-13T00:00:00Z")).get
          .orderBy("event_id")
      },
      Some("""SELECT event_id, ts, user_id, value FROM events
             |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
             |              AND TIMESTAMP '2024-01-13 00:00:00'
             |ORDER BY event_id""".stripMargin)),

    // HIDDEN PARTITIONING (Iceberg transforms on this catalog): CREATE
    // TABLE ... PARTITIONED BY (days(ts)) declares the layout ONCE;
    // INSERT INTO routes every row into its day partition with no
    // writer-side knob, auto-recording tight per-day ts stats — so the
    // time-window read back prunes at manifest cost through the plain
    // SQL path (the pruned flag pins it). The oracle is the plain
    // filter over the same rows: transform routing, hive-escaped group
    // renames, and per-group stats must be value-lossless end to end.
    QueryDef(
      "s_hidden_partitioning",
      (s, d) => {
        // CREATE + transform-routed INSERT baked into the cached
        // fixture; iterations measure the pruned SQL read
        val root = QueryFixtures.hiddenPartLake(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val snap = graft.storage.TxnCatalog.snapshot(s, root).get
        def utc(iso: String) =
          java.sql.Timestamp.from(java.time.Instant.parse(iso))
        val surviving = snap.partitionsWhere("ev", "ts",
          utc("2024-01-10T00:00:00Z"), utc("2024-01-13T00:00:00Z"))
        val pruned = surviving.size <
          snap.partitions("ev").count(_.contains("ts="))
        s.sql(s"""SELECT event_id, ts, value FROM $cat.default.ev
                 |WHERE ts BETWEEN timestamp'2024-01-10 00:00:00'
                 |             AND timestamp'2024-01-13 00:00:00'
                 |ORDER BY event_id""".stripMargin)
          .withColumn("pruned", lit(pruned))
      },
      Some("""SELECT event_id, ts, value, TRUE AS pruned FROM events
             |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
             |             AND TIMESTAMP '2024-01-13 00:00:00'
             |ORDER BY event_id""".stripMargin)),

    // PARTITION-SPEC EVOLUTION (Iceberg's signature layout feature):
    // the table starts PARTITIONED BY (months(ts)), takes half the
    // rows, evolves to days(ts) via CALL system.evolve_partitioning —
    // ONE manifest-only commit, zero data rewritten — and takes the
    // other half. The time-window read must prune (manifest stats hold
    // on BOTH generations, since pruning never parses names) and
    // return exactly the plain filter's rows. mixed_layout pins that
    // month- AND day-named partitions genuinely coexist, so the green
    // hash is evidence of cross-generation correctness, not of a
    // silent full rewrite.
    QueryDef(
      "s_partition_evolution",
      (s, d) => {
        val root = QueryFixtures.evolvePartLake(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val snap = graft.storage.TxnCatalog.snapshot(s, root).get
        def utc(iso: String) =
          java.sql.Timestamp.from(java.time.Instant.parse(iso))
        // spec-routed partitions are named b<nonce>.ts=<group value>:
        // a month group renders yyyy-MM, a day group yyyy-MM-dd
        val parts = snap.partitions("ev").filter(_.contains("ts="))
        val monthGen = parts.exists(_.matches(""".*\.ts=\d{4}-\d{2}"""))
        val dayGen = parts.exists(_.matches(""".*\.ts=\d{4}-\d{2}-\d{2}"""))
        val surviving = snap.partitionsWhere("ev", "ts",
          utc("2024-01-10T00:00:00Z"), utc("2024-01-13T00:00:00Z"))
        val pruned = surviving.size < parts.size
        s.sql(s"""SELECT event_id, ts, value FROM $cat.default.ev
                 |WHERE ts BETWEEN timestamp'2024-01-10 00:00:00'
                 |             AND timestamp'2024-01-13 00:00:00'
                 |ORDER BY event_id""".stripMargin)
          .withColumn("pruned", lit(pruned))
          .withColumn("mixed_layout", lit(monthGen && dayGen))
      },
      Some("""SELECT event_id, ts, value, TRUE AS pruned,
             |  TRUE AS mixed_layout FROM events
             |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
             |             AND TIMESTAMP '2024-01-13 00:00:00'
             |ORDER BY event_id""".stripMargin)),

    // Storage round trip through CATALYST-PLANNED skipping: the same
    // commit→cluster lake as s_zorder_skipping, but read via
    // GraftLake.table — an ordinary DataFrame whose FileSourceScanExec
    // asks ManifestFileIndex for its file list, so the plain `.where`
    // below prunes partitions through the manifest stats with NO
    // special read API (readWhere's semantics, Delta-style wiring).
    // The conjunct on c_mktsegment exercises the conservative path
    // (string stats present, equality+bloomless → range-only) alongside
    // the pruning range on c_acctbal.
    QueryDef(
      "s_catalyst_skipping",
      (s, d) => {
        val root = QueryFixtures.custZLake(s, d) // shared cached lake
        graft.storage.GraftLake.table(s, root, "cust").get
          .where(col("c_acctbal").between(1000.0, 3000.0) &&
            col("c_mktsegment") === "BUILDING")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
             |WHERE c_acctbal BETWEEN 1000.0 AND 3000.0
             |  AND c_mktsegment = 'BUILDING'
             |ORDER BY c_custkey""".stripMargin)),

    // NULL-count skipping round trip: partition a nullable derived
    // column so one partition is null-free (its manifest stat records
    // nulls = 0), then `IS NULL` must prune that partition at manifest
    // cost while returning exactly SQL's null rows. The pruning fact
    // rides as a pinned boolean (file counts vary with writer
    // parallelism; the inequality does not).
    QueryDef(
      "s_null_skipping",
      (s, d) => {
        val root = QueryFixtures.nullSkipLake(s, d) // shared cached lake
        val snap = graft.storage.TxnCatalog.snapshot(s, root).get
        val idx = graft.storage.GraftLake.index(s, root, "cust", snap)
        val surviving = idx.survivingFileCount(Seq(
          org.apache.spark.sql.catalyst.expressions.IsNull(
            org.apache.spark.sql.catalyst.expressions.AttributeReference(
              "bal_pos", org.apache.spark.sql.types.DoubleType)())))
        val pruned = surviving < idx.totalFileCount
        graft.storage.GraftLake.table(s, root, "cust").get
          .where(col("bal_pos").isNull)
          .select("c_custkey")
          .withColumn("pruned", lit(pruned))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, TRUE AS pruned FROM customer
             |WHERE c_acctbal < 0 ORDER BY c_custkey""".stripMargin)),

    // Storage round trip for skipping-aware DELETE: commit overlapping
    // batches, deleteWhere a value range (only partitions whose stats
    // may overlap are rewritten; null keys survive per SQL DELETE), read
    // everything back — the survivors must be exactly the SQL
    // complement. The range is interior on both sides (acctbal spans
    // about [-999.99, 9999.99] at every SF), so rows survive below AND
    // above it.
    QueryDef(
      "s_delete_where",
      (s, d) => {
        // the skipping-aware rewrite happens once in the cached fixture;
        // the read asserts the surviving complement every run
        val root = QueryFixtures.custDeleteWhereLake(s, d)
        graft.storage.TxnCatalog.read(s, root, "cust").get
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE NOT (c_acctbal BETWEEN 0.0 AND 4000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Storage round trip for MERGE-ON-READ deletes: commit overlapping
    // batches, deleteKeys (an O(keys) commit — no data rewritten), then
    // RE-INSERT one deleted key in a newer batch: the delete masks only
    // data that predates it, so the re-inserted row must come back while
    // the other keys stay gone — Iceberg's equality-delete sequence
    // semantics under the DuckDB hash gate. 4242 exists only at
    // sf >= 0.1; both engines adapt identically.
    QueryDef(
      "s_delete_keys",
      (s, d) => {
        // delete-then-reinsert history baked into the cached fixture;
        // every read replays the merge-on-read sequence semantics
        val root = QueryFixtures.partsDeleteKeysLake(s, d)
        graft.storage.TxnCatalog.read(s, root, "parts").get
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey NOT IN (77, 4242)
             |ORDER BY p_partkey""".stripMargin)),

    // Storage round trip for POSITIONAL merge-on-read deletes (deletion
    // vectors): commit hash-split batches, deletePositions with a
    // multi-column OR predicate — a shape equality keys and single-axis
    // range rewrites cannot address — and read back. No data file is
    // rewritten: matching rows are masked by their (file path, row
    // index) coordinates through the same anti-join funnel equality
    // deletes ride, so the survivors must be exactly the SQL complement
    // of the predicate. Delta DVs / Iceberg position deletes on this
    // catalog's txn axis.
    QueryDef(
      "s_dv_delete",
      (s, d) => {
        val root = QueryFixtures.custDvDeleteLake(s, d)
        graft.storage.TxnCatalog.read(s, root, "cust").get
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
             |WHERE NOT ((c_acctbal > 5000.0 AND c_mktsegment = 'BUILDING')
             |        OR (c_acctbal < 0.0 AND c_mktsegment = 'AUTOMOBILE'))
             |ORDER BY c_custkey""".stripMargin)),

    // Bulk-load round trip: ONE partitionBy write job + ONE grouped
    // stats job land every market segment as its own partition in one
    // txn (commitPartitioned — the O(1)-jobs path a 10 000-partition
    // initial load needs), then an equality read prunes to the single
    // owning partition via the grouped min=max stats. The oracle is the
    // plain filter: the bulk staging, hive-escaped renames, and grouped
    // stats must be value-lossless end to end.
    QueryDef(
      "s_bulk_partitioned",
      (s, d) => {
        // O(1)-jobs bulk load baked into the cached fixture;
        // iterations measure the pruned equality read
        val root = QueryFixtures.bulkPartLake(s, d)
        graft.storage.TxnCatalog.snapshot(s, root).get
          .readWhereEq("cust", "c_mktsegment", "BUILDING").get
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
             |WHERE c_mktsegment = 'BUILDING'
             |ORDER BY c_custkey""".stripMargin)),

    // The lake as a Spark SQL CATALOG (DSv2 TableCatalog + V1 bridges):
    // commit batches, mount the root as a catalog, and answer plain SQL
    // BY IDENTIFIER — INSERT INTO lands an atomic batch partition, the
    // SELECT's pushed filter prunes through the manifest inside the
    // bridge, and the result must hash-equal the oracle's filter over
    // source ∪ inserted rows. A unique catalog name per run keeps
    // Spark's per-name plugin cache from pinning a stale root.
    QueryDef(
      "s_sql_catalog",
      (s, d) => {
        // base lake cached; each iteration INSERTs into a zero-copy
        // shallow clone, measuring the insert + pruned read it tests
        val root = QueryFixtures.sqlCatBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"INSERT INTO $cat.default.$t VALUES " +
          "(10000001, 1500.50), (10000002, 9999.99)")
        s.sql(
          s"""SELECT c_custkey, c_acctbal FROM $cat.default.$t
             |WHERE c_acctbal BETWEEN 1000.0 AND 3000.0
             |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal FROM (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  UNION ALL VALUES (10000001, 1500.50), (10000002, 9999.99))
             |WHERE c_acctbal BETWEEN 1000.0 AND 3000.0
             |ORDER BY c_custkey""".stripMargin)),

    // METADATA-ONLY SQL AGGREGATE over the catalog identifier: the
    // 100 TB sanity queries — count(*), count(col), min/max of a stats
    // column — answered from the MANIFEST with zero file reads, now on
    // the SQL path too (MetadataOnlyAgg's DSv2 match; the DataFrame
    // path has folded since round 2). The fold actually happening is
    // pinned as a constant column read off the optimized plan: a
    // LocalRelation or the oracle fails.
    QueryDef(
      "s_sql_meta_agg",
      (s, d) => {
        graft.plans.MetadataOnlyAgg.install(s)
        val root = QueryFixtures.sqlCatBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val q = s.sql(
          s"""SELECT count(*) AS n_rows, count(c_acctbal) AS n_bal,
             |  min(c_custkey) AS lo_key, max(c_custkey) AS hi_key
             |FROM $cat.default.cust""".stripMargin)
        val folded = q.queryExecution.optimizedPlan
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
        q.withColumn("metadata_only", lit(folded))
      },
      Some("""SELECT count(*) AS n_rows, count(c_acctbal) AS n_bal,
             |  min(c_custkey) AS lo_key, max(c_custkey) AS hi_key,
             |  TRUE AS metadata_only FROM customer""".stripMargin)),

    // GROUPED METADATA-ONLY AGGREGATE: `GROUP BY <partition column>`
    // answered from the manifest — Iceberg's `partitions` metadata
    // table as an optimizer rewrite. Each entry holds ONE segment
    // (identity-partitioned layout; recorded min == max attributes the
    // entry to its group), so per-segment count/min/max fold with ZERO
    // file reads — on a 100 TB table this is "rows per partition" for
    // the price of a driver-side manifest read. The fold actually
    // firing is pinned as a constant column: every leaf of the
    // optimized plan must be a LocalRelation or the oracle fails.
    QueryDef(
      "s_sql_group_meta",
      (s, d) => {
        graft.plans.MetadataOnlyAgg.install(s)
        val root = QueryFixtures.groupMetaBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val q = s.sql(
          s"""SELECT c_mktsegment, count(*) AS n_rows,
             |  count(c_acctbal) AS n_bal, min(c_custkey) AS lo_key,
             |  max(c_custkey) AS hi_key
             |FROM $cat.default.cust
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
        val folded = q.queryExecution.optimizedPlan.collectLeaves()
          .forall(_.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
        q.withColumn("metadata_only", lit(folded))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_rows,
             |  count(c_acctbal) AS n_bal, min(c_custkey) AS lo_key,
             |  max(c_custkey) AS hi_key, TRUE AS metadata_only
             |FROM customer GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // FILTERED METADATA-ONLY AGGREGATE: a WHERE over constant-per-
    // entry columns prunes manifest entries (each entry keeps all rows
    // or none — exactly attributable), then the aggregate folds over
    // the survivors: `count(*) WHERE segment IN (...)` answered by a
    // driver-side manifest read, zero cluster jobs. The predicate is
    // evaluated per entry by Catalyst itself (attributes substituted
    // with the entry's constants), so coercion semantics can never
    // drift from a real scan's. Fold pinned as a constant column.
    QueryDef(
      "s_meta_filter_agg",
      (s, d) => {
        graft.plans.MetadataOnlyAgg.install(s)
        val root = QueryFixtures.groupMetaBase(s, d)
        graft.storage.GraftLake.table(s, root, "cust").get
          .createOrReplaceTempView("meta_filter_cust")
        val q = s.sql(
          """SELECT count(*) AS n_rows, min(c_custkey) AS lo_key,
            |  max(c_custkey) AS hi_key
            |FROM meta_filter_cust
            |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""".stripMargin)
        val folded = q.queryExecution.optimizedPlan.collectLeaves()
          .forall(_.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
        q.withColumn("metadata_only", lit(folded))
      },
      Some("""SELECT count(*) AS n_rows, min(c_custkey) AS lo_key,
             |  max(c_custkey) AS hi_key, TRUE AS metadata_only
             |FROM customer
             |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""".stripMargin)),

    // EXACT SUM METADATA FOLD: per-entry decimal(38) sums recorded in
    // the same stats pass as min/max make `sum(col)` — ungrouped,
    // grouped, and under a constant-column WHERE — a driver-side
    // manifest read. `sum(revenue) GROUP BY day` over a 100 TB table
    // costs zero file reads; the fold refuses (keeps the scan) for
    // float/double columns (order-dependent rounding), totals outside
    // the result type, DISTINCT, or any entry missing the stat —
    // exact or not given, like every metadata answer. Fold pinned as
    // a constant column off the optimized plan.
    QueryDef(
      "s_sql_sum_fold",
      (s, d) => {
        graft.plans.MetadataOnlyAgg.install(s)
        val root = QueryFixtures.groupMetaBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        // catalog-path ungrouped sum + count(DISTINCT segment): one
        // driver-side manifest read each, pinned as constants (value +
        // plan shape)
        val c = s.sql(
          s"""SELECT sum(c_custkey) AS s,
             |  count(DISTINCT c_mktsegment) AS nseg
             |FROM $cat.default.cust""".stripMargin)
        val cFolded = c.queryExecution.optimizedPlan.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
        val cRow = c.collect().head
        val (total, nseg) = (cRow.getLong(0), cRow.getLong(1))
        // DataFrame-path grouped sum under a constant-column WHERE
        graft.storage.GraftLake.table(s, root, "cust").get
          .createOrReplaceTempView("sum_fold_cust")
        val q = s.sql(
          """SELECT c_mktsegment, sum(c_custkey) AS sum_key,
            |  count(*) AS n_rows, min(c_custkey) AS lo_key
            |FROM sum_fold_cust
            |WHERE c_mktsegment <> 'FURNITURE'
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
        val folded = q.queryExecution.optimizedPlan.collectLeaves()
          .forall(_.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
        q.withColumn("metadata_only", lit(folded && cFolded))
          .withColumn("total_key", lit(total))
          .withColumn("n_segments", lit(nseg))
      },
      Some("""SELECT c_mktsegment,
             |  CAST(sum(c_custkey) AS BIGINT) AS sum_key,
             |  count(*) AS n_rows, min(c_custkey) AS lo_key,
             |  TRUE AS metadata_only,
             |  (SELECT CAST(sum(c_custkey) AS BIGINT) FROM customer)
             |    AS total_key,
             |  (SELECT count(DISTINCT c_mktsegment) FROM customer)
             |    AS n_segments
             |FROM customer WHERE c_mktsegment <> 'FURNITURE'
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // SKIPPING OBSERVABILITY: `CALL system.skipping(...)` dry-runs the
    // point-lookup pruning at manifest cost and reports the per-layer
    // kill counts — the 100 TB layout-audit loop (is this key worth a
    // Bloom? is the table clustered enough?) without launching a scan.
    // The report uses the READ PATH's own predicates, pinned here two
    // ways: the layer counts as constants (a present key range-prunes
    // 3 of 4 disjoint ranges and scans 1; an absent odd probe against
    // the even-only key range-prunes 3 and BLOOM-prunes the survivor),
    // and the actual pruned read's rows hash-checked against DuckDB.
    QueryDef(
      "s_skipping_report",
      (s, d) => {
        val root = QueryFixtures.skipBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val hit = s.sql(s"""CALL $cat.system.skipping(table => 'cust',
          column => 'c_custkey', value => '42')""").collect().head
        val miss = s.sql(s"""CALL $cat.system.skipping(table => 'cust',
          column => 'c_evenkey', value => '85')""").collect().head
        s.sql(s"""SELECT c_custkey, c_acctbal FROM $cat.default.cust
                 |WHERE c_custkey = 42""".stripMargin)
          .withColumn("entries_total", lit(hit.getInt(0)))
          .withColumn("hit_pruned_range", lit(hit.getInt(1)))
          .withColumn("hit_scanned", lit(hit.getInt(3)))
          .withColumn("miss_pruned_range", lit(miss.getInt(1)))
          .withColumn("miss_pruned_bloom", lit(miss.getInt(2)))
          .withColumn("miss_scanned", lit(miss.getInt(3)))
      },
      Some("""SELECT c_custkey, c_acctbal, 4 AS entries_total,
             |  3 AS hit_pruned_range, 1 AS hit_scanned,
             |  3 AS miss_pruned_range, 1 AS miss_pruned_bloom,
             |  0 AS miss_scanned
             |FROM customer WHERE c_custkey = 42""".stripMargin)),

    // CROSS-ROOT EXPORT (`CALL system.export`): deep-copy a pinned
    // snapshot into ANOTHER catalog root in one conditional commit
    // there — promotion, DR, dataset sharing. The fixture lake holds a
    // PENDING equality delete, so this also pins that exports read
    // through the delete funnel and MATERIALIZE the masks: the
    // destination is a clean table (zero delete entries — pinned as a
    // constant column) whose rows are exactly the source's funnel
    // read. Read back from the DESTINATION catalog.
    QueryDef(
      "s_export",
      (s, d) => {
        val root = QueryFixtures.exportBase(s, d)
        val dest = java.nio.file.Files
          .createTempDirectory("q_export").toString
        val cat = QueryFixtures.sqlCatalog(s, root)
        val r = s.sql(s"CALL $cat.system.export(dest => '$dest')")
          .collect().head
        val dcat = QueryFixtures.sqlCatalog(s, dest)
        val dsnap = graft.storage.TxnCatalog.snapshot(s, dest).get
        s.sql(s"""SELECT c_custkey, c_mktsegment,
                 |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $dcat.default.cust
                 |ORDER BY c_custkey""".stripMargin)
          .withColumn("dest_txn", lit(r.getLong(0)))
          .withColumn("n_tables", lit(r.getInt(1)))
          .withColumn("clean_dest",
            lit(dsnap.deleteEntries("cust").isEmpty))
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
             |  CAST(1 AS BIGINT) AS dest_txn, 1 AS n_tables,
             |  TRUE AS clean_dest
             |FROM customer WHERE c_custkey NOT IN (7, 42)
             |ORDER BY c_custkey""".stripMargin)),

    // ZERO-COPY cross-root export (`mode => 'reference'`): the
    // destination manifest names the SOURCE's physical dirs (`~ext:`)
    // with stats carried verbatim — instant same-filesystem promotion.
    // Pinned two ways: the destination holds ZERO data files (only the
    // KB-scale `~p` props entry — counted and emitted as a constant)
    // yet reads the full table, and the carried stats still answer the
    // metadata plane there (row count folded, emitted as a constant).
    QueryDef(
      "s_export_ref",
      (s, d) => {
        val root = QueryFixtures.groupMetaBase(s, d)
        val dest = java.nio.file.Files
          .createTempDirectory("q_exportref").toString
        val cat = QueryFixtures.sqlCatalog(s, root)
        s.sql(s"CALL $cat.system.export(dest => '$dest', " +
          "mode => 'reference')").collect()
        def parquets(f: java.io.File): Int = {
          val kids = Option(f.listFiles()).toSeq.flatten
          kids.count(k => k.isFile && k.getName.endsWith(".parquet") &&
            !k.getParentFile.getName.startsWith("~p")) +
            kids.filter(k => k.isDirectory && k.getName != "_txns" &&
              !k.getName.startsWith("~p")).map(parquets).sum
        }
        val dsnap = graft.storage.TxnCatalog.snapshot(s, dest).get
        val folded = dsnap.rowCount("cust")
        s.sql(s"""SELECT c_custkey, c_mktsegment,
                 |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM ${QueryFixtures.sqlCatalog(s, dest)}.default.cust
                 |ORDER BY c_custkey""".stripMargin)
          .withColumn("dest_data_files",
            lit(parquets(new java.io.File(dest))))
          .withColumn("folded_rows", lit(folded.getOrElse(-1L)))
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
             |  0 AS dest_data_files,
             |  (SELECT CAST(count(*) AS BIGINT) FROM customer)
             |    AS folded_rows
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // SQL MERGE INTO over the lake catalog (GraftMergeStrategy): the
    // canonical upsert — matched keys take the source row, new keys
    // insert — lands as ONE txn of equality-delete keys + one batch
    // (merge-on-read, O(source), no table rewrite). The oracle is the
    // classic UPDATE+INSERT expansion over the same rows.
    QueryDef(
      "s_sql_merge",
      (s, d) => {
        // base lake cached; each iteration MERGEs into a zero-copy
        // shallow clone — the O(source) txn + read-back under test
        val root = QueryFixtures.mergeBase(s, d)
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.GraftMerge.install(s)
        cust.filter(col("c_custkey") < 50)
          .select(col("c_custkey"),
            (col("c_acctbal") + 1000.0).as("c_acctbal"))
          .union(s.sql("SELECT CAST(90000001 AS BIGINT), CAST(111.25 AS DOUBLE) " +
            "UNION ALL SELECT CAST(90000002 AS BIGINT), CAST(222.5 AS DOUBLE)"))
          .createOrReplaceTempView(s"${cat}_src")
        s.sql(s"""MERGE INTO $cat.default.$t t USING ${cat}_src src
                 |ON t.c_custkey = src.c_custkey
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT c_custkey, c_acctbal + 1000.0 AS c_acctbal
             |  FROM customer WHERE c_custkey < 50
             |  UNION ALL VALUES (90000001, 111.25), (90000002, 222.5)),
             |merged AS (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM src)
             |  UNION ALL SELECT c_custkey, c_acctbal FROM src)
             |SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
             |FROM merged ORDER BY c_custkey""".stripMargin)),

    // Atomic CTAS + RTAS round trip (DSv2 StagingTableCatalog): CREATE
    // TABLE AS SELECT lands rows + schema + properties in ONE txn, and
    // REPLACE TABLE AS SELECT supersedes the old content in ONE txn —
    // never the non-atomic drop-then-create window. Pinned evidence:
    // each statement advanced the txn counter exactly once, and the
    // pre-replace content is still readable by time travel.
    QueryDef(
      "s_sql_ctas",
      (s, d) => {
        val root = java.nio.file.Files
          .createTempDirectory("q_ctas").toString
        val cat = s"qcta${java.util.UUID.randomUUID().toString.take(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.storage.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", root)
        Tables.customer(s, d).select("c_custkey", "c_acctbal")
          .createOrReplaceTempView(s"${cat}_cust")
        s.sql(s"""CREATE TABLE $cat.default.rich AS
                 |SELECT c_custkey, c_acctbal FROM ${cat}_cust
                 |WHERE c_acctbal > 5000""".stripMargin)
        val t1 = graft.storage.TxnCatalog.currentTxn(s, root).get
        s.sql(s"""REPLACE TABLE $cat.default.rich AS
                 |SELECT c_custkey, c_acctbal FROM ${cat}_cust
                 |WHERE c_acctbal <= 5000""".stripMargin)
        val t2 = graft.storage.TxnCatalog.currentTxn(s, root).get
        val richBefore = s.sql(
          s"SELECT count(*) FROM $cat.default.rich VERSION AS OF $t1")
          .collect().head.getLong(0)
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $cat.default.rich ORDER BY c_custkey""".stripMargin)
          .withColumn("rich_before", lit(richBefore))
          .withColumn("one_txn_each", lit(t1 == 1L && t2 == 2L))
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
             |   WHERE c_acctbal > 5000) AS rich_before,
             |  TRUE AS one_txn_each
             |FROM customer WHERE c_acctbal <= 5000
             |ORDER BY c_custkey""".stripMargin)),

    // SQL MERGE with the full clause surface: a CONDITIONAL matched
    // UPDATE (rows failing the condition stay untouched — their keys
    // are never masked), a CONDITIONAL insert, and the sync shape
    // `WHEN NOT MATCHED BY SOURCE THEN DELETE` (target keys absent
    // from the source are dropped via one anti-join key list — never a
    // partition rewrite). Oracle: join-survivors + qualifying inserts.
    QueryDef(
      "s_sql_merge_sync",
      (s, d) => {
        val root = QueryFixtures.mergeBase(s, d)
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.GraftMerge.install(s)
        cust.filter(col("c_custkey") < 100)
          .union(s.sql("SELECT CAST(90000001 AS BIGINT), CAST(9000.0 AS DOUBLE) " +
            "UNION ALL SELECT CAST(90000002 AS BIGINT), CAST(100.0 AS DOUBLE)"))
          .createOrReplaceTempView(s"${cat}_msrc")
        s.sql(s"""MERGE INTO $cat.default.$t t USING ${cat}_msrc src
                 |ON t.c_custkey = src.c_custkey
                 |WHEN MATCHED AND src.c_acctbal >= 0
                 |  THEN UPDATE SET c_acctbal = src.c_acctbal + 10000.0
                 |WHEN NOT MATCHED AND src.c_acctbal > 5000 THEN INSERT *
                 |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_custkey < 100
             |  UNION ALL VALUES (90000001, 9000.0), (90000002, 100.0)),
             |kept AS (
             |  SELECT t.c_custkey,
             |    CASE WHEN s.c_acctbal >= 0 THEN s.c_acctbal + 10000.0
             |         ELSE t.c_acctbal END AS c_acctbal
             |  FROM customer t JOIN src s USING (c_custkey)),
             |ins AS (
             |  SELECT c_custkey, c_acctbal FROM src
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM customer)
             |    AND c_acctbal > 5000)
             |SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
             |FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
             |ORDER BY c_custkey""".stripMargin)),

    // MERGE WITH SCHEMA EVOLUTION (VERDICT r8 task #3): the source
    // carries a column the target lacks; the analyzer's evolution rule
    // (gated on the AUTOMATIC_SCHEMA_EVOLUTION capability) drives an
    // ADD-COLUMN through GraftCatalog.alterTable — ONE zero-row
    // widened-schema commit — then the merge lands against the evolved
    // table. Pre-existing rows surface the new column as NULL through
    // the merged-footer read; matched rows take the source's value via
    // SET *. Oracle: the UPDATE+INSERT expansion with a NULL backfill.
    QueryDef(
      "s_sql_merge_evolve",
      (s, d) => {
        val root = QueryFixtures.mergeBase(s, d)
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.GraftMerge.install(s)
        cust.filter(col("c_custkey") < 80)
          .select(col("c_custkey"),
            (col("c_acctbal") + 500.0).as("c_acctbal"),
            (col("c_custkey") % 5).cast("int").as("tier"))
          .union(s.sql("SELECT CAST(90000001 AS BIGINT), " +
            "CAST(777.0 AS DOUBLE), CAST(9 AS INT)"))
          .createOrReplaceTempView(s"${cat}_evsrc")
        s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.default.$t t
                 |USING ${cat}_evsrc src
                 |ON t.c_custkey = src.c_custkey
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
                 |  tier FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT c_custkey, c_acctbal + 500.0 AS c_acctbal,
             |    CAST(c_custkey % 5 AS INT) AS tier
             |  FROM customer WHERE c_custkey < 80
             |  UNION ALL SELECT 90000001, 777.0, 9),
             |merged AS (
             |  SELECT c_custkey, c_acctbal, CAST(NULL AS INT) AS tier
             |  FROM customer
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM src)
             |  UNION ALL SELECT c_custkey, c_acctbal, tier FROM src)
             |SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal, tier
             |FROM merged ORDER BY c_custkey""".stripMargin)),

    // ORDERED multi-clause SQL MERGE (first-match-wins, the Delta/SQL
    // contract — VERDICT r8 task #2): three MATCHED clauses (a
    // conditional DELETE shadowing a conditional UPDATE shadowing the
    // unconditional fallback UPDATE) and two NOT MATCHED INSERT
    // clauses (conditional real-value insert shadowing a sentinel
    // insert). A matched row satisfying BOTH the delete and update
    // conditions must DELETE — clause order, not clause kind, decides.
    // Executes on the positional path: every row tagged with its
    // winning clause inside one target scan, one DV + one batch in one
    // txn. Oracle: the CASE-expansion of the same precedence.
    QueryDef(
      "s_sql_merge_multi",
      (s, d) => {
        val root = QueryFixtures.mergeBase(s, d)
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.GraftMerge.install(s)
        cust.filter(col("c_custkey") < 150)
          .select(col("c_custkey"),
            (col("c_acctbal") - 3000.0).as("c_acctbal"))
          .union(s.sql(
            "SELECT CAST(90000001 AS BIGINT), CAST(9000.0 AS DOUBLE) " +
            "UNION ALL SELECT CAST(90000002 AS BIGINT), CAST(100.0 AS DOUBLE)"))
          .createOrReplaceTempView(s"${cat}_mmsrc")
        s.sql(s"""MERGE INTO $cat.default.$t t USING ${cat}_mmsrc src
                 |ON t.c_custkey = src.c_custkey
                 |WHEN MATCHED AND src.c_acctbal < 0 THEN DELETE
                 |WHEN MATCHED AND t.c_acctbal < 2000.0 THEN UPDATE
                 |  SET c_acctbal = src.c_acctbal + 100000.0
                 |WHEN MATCHED THEN UPDATE SET c_acctbal = t.c_acctbal + 1.0
                 |WHEN NOT MATCHED AND src.c_acctbal > 5000.0 THEN INSERT
                 |  (c_custkey, c_acctbal) VALUES (src.c_custkey, src.c_acctbal)
                 |WHEN NOT MATCHED THEN INSERT
                 |  (c_custkey, c_acctbal) VALUES (src.c_custkey, -1.0)
                 |""".stripMargin)
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT c_custkey, c_acctbal - 3000.0 AS s_bal
             |  FROM customer WHERE c_custkey < 150
             |  UNION ALL VALUES (90000001, 9000.0), (90000002, 100.0)),
             |kept AS (
             |  SELECT t.c_custkey,
             |    CASE WHEN s.c_custkey IS NULL THEN t.c_acctbal
             |         WHEN t.c_acctbal < 2000.0 THEN s.s_bal + 100000.0
             |         ELSE t.c_acctbal + 1.0 END AS c_acctbal
             |  FROM customer t LEFT JOIN src s USING (c_custkey)
             |  WHERE s.c_custkey IS NULL OR NOT (s.s_bal < 0)),
             |ins AS (
             |  SELECT c_custkey,
             |    CASE WHEN s_bal > 5000.0 THEN s_bal ELSE -1.0 END AS c_acctbal
             |  FROM src
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM customer))
             |SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
             |FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
             |ORDER BY c_custkey""".stripMargin)),

    // SQL UPDATE over the lake catalog: a range WHERE prunes the rewrite
    // to the partitions whose manifest stats may match (skipping-aware,
    // one conditional txn), the SET is an expression over the row's own
    // columns. The oracle is the plain CASE projection.
    QueryDef(
      "s_sql_update",
      (s, d) => {
        val root = QueryFixtures.update4Base(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.GraftMerge.install(s)
        s.sql(s"""UPDATE $cat.default.$t
                 |SET c_acctbal = c_acctbal + 10000.0
                 |WHERE c_acctbal >= 1000.0 AND c_acctbal <= 3000.0
                 |""".stripMargin)
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(CASE WHEN c_acctbal BETWEEN 1000.0 AND 3000.0
             |       THEN c_acctbal + 10000.0 ELSE c_acctbal END AS DOUBLE)
             |    AS c_acctbal
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // SQL MERGE with a COMPOSITE key — `ON t.k1 = s.k1 AND t.k2 = s.k2`
    // has no single-equality rendering, so it takes the POSITIONAL
    // path: the target joins the source under the raw condition, rows
    // qualifying the conditional MATCHED UPDATE mask by (file, row)
    // coordinate and replacements + inserts append — one deletion
    // vector + one batch in one txn, no partition rewrite. Oracle:
    // LEFT-JOIN CASE expansion of the same clauses.
    QueryDef(
      "s_sql_merge_pos",
      (s, d) => {
        val root = QueryFixtures.mergePosBase(s, d)
        val cust = Tables.customer(s, d)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.GraftMerge.install(s)
        cust.filter(col("c_custkey") < 200)
          .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
          .union(s.sql("SELECT CAST(90000001 AS BIGINT), 'BUILDING', " +
            "CAST(1234.5 AS DOUBLE)"))
          .createOrReplaceTempView(s"${cat}_psrc")
        s.sql(s"""MERGE INTO $cat.default.$t t USING ${cat}_psrc src
                 |ON t.c_custkey = src.c_custkey
                 |  AND t.c_mktsegment = src.c_mktsegment
                 |WHEN MATCHED AND src.c_acctbal > 0
                 |  THEN UPDATE SET c_acctbal = src.c_acctbal
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        s.sql(s"""SELECT c_custkey, c_mktsegment,
                 |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $cat.default.$t
                 |ORDER BY c_custkey, c_mktsegment""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT c_custkey, c_mktsegment, c_acctbal + 1000.0 AS c_acctbal
             |  FROM customer WHERE c_custkey < 200
             |  UNION ALL VALUES (90000001, 'BUILDING', 1234.5)),
             |upd AS (
             |  SELECT t.c_custkey, t.c_mktsegment,
             |    CASE WHEN s.c_custkey IS NOT NULL AND s.c_acctbal > 0
             |         THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
             |  FROM customer t LEFT JOIN src s
             |    ON t.c_custkey = s.c_custkey
             |   AND t.c_mktsegment = s.c_mktsegment),
             |ins AS (
             |  SELECT s.c_custkey, s.c_mktsegment, s.c_acctbal
             |  FROM src s LEFT JOIN customer t
             |    ON t.c_custkey = s.c_custkey
             |   AND t.c_mktsegment = s.c_mktsegment
             |  WHERE t.c_custkey IS NULL)
             |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
             |FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
             |ORDER BY c_custkey, c_mktsegment""".stripMargin)),

    // SQL UPDATE with an UNPRUNABLE WHERE (OR across two columns — no
    // manifest bounds): the planner routes it to the DV-backed
    // positional update (one funnel scan, (file,row) vector + appended
    // batch in ONE txn) instead of rewriting every partition. The
    // dv_path flag pins the route: a pending positional delete entry
    // proves no partition rewrite happened. Oracle: CASE projection.
    QueryDef(
      "s_sql_update_dv",
      (s, d) => {
        val root = QueryFixtures.updateDvBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.GraftMerge.install(s)
        s.sql(s"""UPDATE $cat.default.$t
                 |SET c_acctbal = c_acctbal + 50000.0
                 |WHERE c_mktsegment = 'MACHINERY' OR c_acctbal < 0.0
                 |""".stripMargin)
        val dvPath = graft.storage.TxnCatalog.snapshot(s, root).get
          .deleteEntries(t)
          .exists(_._3 == graft.storage.TxnCatalog.DeletePosMarker)
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
                 |  c_mktsegment FROM $cat.default.$t
                 |ORDER BY c_custkey""".stripMargin)
          .withColumn("dv_path", lit(dvPath))
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(CASE WHEN c_mktsegment = 'MACHINERY' OR c_acctbal < 0.0
             |       THEN c_acctbal + 50000.0 ELSE c_acctbal END AS DOUBLE)
             |    AS c_acctbal,
             |  c_mktsegment, TRUE AS dv_path
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Row-level CDC feed derived from the manifest alone: txn 1 commits
    // two overlapping batches, txn 2 records equality-delete keys (one
    // key absent at every SF — a delete EVENT regardless), txn 3
    // re-inserts a deleted key. The feed must emit each insert at its
    // data txn, each delete key as a null-payload event at the delete
    // txn, and nothing for reorganizations — the oracle is the same
    // history written out as plain SQL unions.
    QueryDef(
      "s_change_feed",
      (s, d) => {
        import s.implicits._
        // txn-1 base hardlink-copied per iteration (absolute txns and
        // the 0..3 feed window must reproduce exactly; a table clone
        // shares the root's txn counter, so root isolation it is)
        val root = QueryFixtures.linkCopy(QueryFixtures.cdcTemplate(s, d))
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        graft.storage.TxnCatalog.deleteKeys(s, root, "cust",
          "c_custkey", Seq(7L, 21L, 4242L).toDF("c_custkey"))
        graft.storage.TxnCatalog.commitPartitions(s, root,
          Seq(("cust", "batch=re",
            cust.filter(col("c_custkey").isin(7L, 42L)))))
        graft.storage.TxnCatalog.changeFeed(s, root, "cust", 0L, 3L).get
          .orderBy("_txn", "_change_type", "c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, _change_type, _txn FROM (
             |  SELECT c_custkey, c_acctbal, 'insert' AS _change_type,
             |         CAST(1 AS BIGINT) AS _txn FROM customer
             |  UNION ALL
             |  SELECT k, NULL, 'delete', 2
             |  FROM (VALUES (7), (21), (4242)) t(k)
             |  UNION ALL
             |  SELECT c_custkey, c_acctbal, 'insert', 3 FROM customer
             |  WHERE c_custkey IN (7, 42))
             |ORDER BY _txn, _change_type, c_custkey""".stripMargin)),

    // The change feed as SQL — `graft_table_changes(ident, from, to)`,
    // Delta's table_changes TVF on this catalog (ChangesTvf): the same
    // feed window as s_change_feed, consumed entirely through SQL with
    // a WHERE over the feed (filters push into the TVF's expansion —
    // it resolves to ordinary manifest-addressed scans at analysis).
    QueryDef(
      "s_table_changes_sql",
      (s, d) => {
        import s.implicits._
        val root = QueryFixtures.linkCopy(QueryFixtures.cdcTemplate(s, d))
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        graft.storage.TxnCatalog.deleteKeys(s, root, "cust",
          "c_custkey", Seq(7L, 21L, 4242L).toDF("c_custkey"))
        graft.storage.TxnCatalog.commitPartitions(s, root,
          Seq(("cust", "batch=re",
            cust.filter(col("c_custkey").isin(7L, 42L)))))
        graft.storage.ChangesTvf.install(s)
        val cat = QueryFixtures.sqlCatalog(s, root)
        s.sql(
          s"""SELECT c_custkey, c_acctbal, _change_type, _txn
             |FROM graft_table_changes('$cat.cust', 0, 3)
             |WHERE _change_type = 'delete' OR c_custkey % 3 = 0
             |ORDER BY _txn, _change_type, c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal, _change_type, _txn FROM (
             |  SELECT c_custkey, c_acctbal, 'insert' AS _change_type,
             |         CAST(1 AS BIGINT) AS _txn FROM customer
             |  UNION ALL
             |  SELECT k, NULL, 'delete', 2
             |  FROM (VALUES (7), (21), (4242)) t(k)
             |  UNION ALL
             |  SELECT c_custkey, c_acctbal, 'insert', 3 FROM customer
             |  WHERE c_custkey IN (7, 42))
             |WHERE _change_type = 'delete' OR c_custkey % 3 = 0
             |ORDER BY _txn, _change_type, c_custkey""".stripMargin)),

    // The maintenance surface as SQL stored procedures (DSv2
    // ProcedureCatalog): CALL system.optimize folds the 4 batch
    // partitions into one compacted partition, CALL system.vacuum
    // reclaims every superseded txn — and the read back must still
    // hash-equal the plain source. The CALL results themselves ride
    // along as constant columns (compacted partition count from
    // optimize's result row, live partitions re-listed, txns kept from
    // vacuum's), so the oracle pins the maintenance OUTCOME, not just
    // row survival.
    QueryDef(
      "s_sql_call",
      (s, d) => {
        // 4-txn base hardlink-copied per iteration: vacuum is ROOT-
        // scoped and the kept-txn pin needs the exact history, so the
        // copy gives each iteration a private lake for ~ms
        val root = QueryFixtures.linkCopy(QueryFixtures.callTemplate(s, d))
        val cat = QueryFixtures.sqlCatalog(s, root)
        val folded = s.sql(s"CALL $cat.system.optimize(table => 'cust', " +
          "stats_columns => 'c_custkey')").collect().head.getInt(1)
        val kept = s.sql(s"CALL $cat.system.vacuum(keep => 1)")
          .collect().head.getInt(1)
        val live = graft.storage.TxnCatalog.partitions(s, root, "cust").size
        s.sql(s"""SELECT c_custkey, c_acctbal FROM $cat.default.cust
                 |WHERE c_custkey <= 200""".stripMargin)
          .withColumn("compacted", lit(folded))
          .withColumn("live_partitions", lit(live))
          .withColumn("kept_txns", lit(kept))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, 4 AS compacted,
             |  1 AS live_partitions, 1 AS kept_txns
             |FROM customer WHERE c_custkey <= 200
             |ORDER BY c_custkey""".stripMargin)),

    // RESTORE round trip (Delta's RESTORE TABLE ... TO VERSION AS OF,
    // manifest-only): commit two batches, destructively deleteWhere
    // almost every row, then CALL system.restore back to the pre-delete
    // txn — the read must hash-equal the UNDELETED source, proving the
    // rollback reinstated the old entries verbatim with zero data
    // copied. The procedure's `restored` outcome rides along as a
    // pinned constant column.
    QueryDef(
      "s_restore",
      (s, d) => {
        // 2-txn base hardlink-copied per iteration; the destructive
        // delete + restore + read are the work each iteration measures
        val root = QueryFixtures.linkCopy(QueryFixtures.restoreTemplate(s, d))
        val t1 = graft.storage.TxnCatalog.currentTxn(s, root).get
        // destroy: acctbal spans about [-999.99, 9999.99] at every SF,
        // so this rewrites or drops nearly every partition
        graft.storage.TxnCatalog.deleteWhere(s, root, "cust",
          "c_acctbal", 0.0, 10000.0)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val restored = s.sql(
          s"CALL $cat.system.restore(table => 'cust', txn => $t1)")
          .collect().head.getBoolean(1)
        graft.storage.TxnCatalog.read(s, root, "cust").get
          .withColumn("restored", lit(restored))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, TRUE AS restored
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // BUCKETED layout round trip (Spark bucketBy / Iceberg bucket(n)
    // re-expressed as a manifest commit): rewrite customer AND orders
    // into 16 hash buckets on the join key, then join + aggregate —
    // the values must hash-equal the plain join, AND the physical plan
    // must contain ZERO hash exchanges (the shuffle was paid once at
    // layout time; both scans report the same HashPartitioning). The
    // exchange count rides along as a pinned constant column, so the
    // driver gate itself asserts the no-shuffle property.
    QueryDef(
      "s_bucket_join",
      (s, d) => {
        // unbucketed base cached; each iteration clones both tables
        // zero-copy and pays only the bucket REWRITE it tests
        val root = QueryFixtures.bucketBase(s, d)
        val tc = QueryFixtures.cloneOf(s, root, "cust")
        val to = QueryFixtures.cloneOf(s, root, "ord")
        graft.storage.TxnCatalog.bucketTable(s, root, tc,
          "c_custkey", 16)
        graft.storage.TxnCatalog.bucketTable(s, root, to,
          "o_custkey", 16)
        val c = graft.storage.GraftLake.table(s, root, tc).get
        val o = graft.storage.GraftLake.table(s, root, to).get
        val joined = c.hint("merge")
          .join(o, c("c_custkey") === o("o_custkey"))
          .groupBy("c_custkey", "c_mktsegment")
          .agg(count(lit(1)).as("order_cnt"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("total_price"))
        // EnsureRequirements runs statically: co-partitioned inputs
        // need no exchange even before AQE — count them in the plan
        val shuffles = "(?i)Exchange hashpartitioning".r
          .findAllIn(joined.queryExecution.executedPlan.toString).length
        joined.withColumn("bucket_shuffles", lit(shuffles))
          .orderBy("c_custkey")
      },
      Some("""SELECT c.c_custkey, c.c_mktsegment,
             |  CAST(COUNT(*) AS BIGINT) AS order_cnt,
             |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS total_price,
             |  0 AS bucket_shuffles
             |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
             |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin)),

    // Incrementally-maintained MATERIALIZED VIEW round trip: build the
    // per-segment rollup over the first two customer batches, append a
    // third, refresh — the refresh must classify as INCREMENTAL (one
    // partition read, pinned as a constant column) and the folded
    // aggregate must hash-equal DuckDB's full GROUP BY over ALL rows.
    // Decimal-cast sums keep incremental == full == oracle bit-exact.
    QueryDef(
      "s_mv_incremental",
      (s, d) => {
        // base (2 folded commits + MV + 1 unfolded commit) hardlink-
        // copied per iteration: the refresh consumes the MV's pending
        // delta state, so each iteration refreshes a private copy and
        // the INCREMENTAL classification reproduces exactly
        val root = QueryFixtures.linkCopy(QueryFixtures.mvIncTemplate(s, d))
        val r = graft.storage.MaterializedAgg.refresh(s, root, "seg_agg")
        graft.storage.TxnCatalog.read(s, root, "seg_agg").get
          .withColumn("refresh_mode", lit(r.mode))
          .withColumn("partitions_read", lit(r.partitionsRead))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
             |    AS DECIMAL(38,2)) AS sum_bal,
             |  CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2)))
             |    AS DECIMAL(18,2)) AS min_bal,
             |  CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2)))
             |    AS DECIMAL(18,2)) AS max_bal,
             |  'incremental' AS refresh_mode, 1 AS partitions_read
             |FROM customer GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // Transparent MV REWRITE (Calcite/Databricks materialized-view
    // rewriting): the same GROUP BY, issued as an ordinary aggregation
    // over the lake frame, must be silently answered from the CURRENT
    // view — the optimized plan scans ev_agg, not the source — and the
    // values must still hash-equal DuckDB's direct aggregate. Which
    // table the plan scans rides along as a pinned constant column, so
    // the driver gate asserts the rewrite itself.
    QueryDef(
      "s_mv_rewrite",
      (s, d) => {
        // base + current MV cached read-only: the transparent-rewrite
        // read mutates nothing, so iterations measure only the rewrite
        val root = QueryFixtures.mvRewriteLake(s, d)
        graft.plans.MvRewrite.install(s)
        val q = graft.storage.GraftLake.table(s, root, "cust").get
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"), sum(col("bal")).as("sum_bal"))
        val scanned = q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => h.location match {
              case m: graft.storage.ManifestFileIndex => m.lakeTable
              case _ => "?"
            }
            case _ => "?"
          }
        }.toSet
        q.withColumn("answered_from", lit(scanned.mkString(",")))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
             |    AS DECIMAL(28,2)) AS sum_bal,
             |  'seg_agg' AS answered_from
             |FROM customer GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // MV rewrite for AVG / COUNT(col): the view stores only ADDITIVE
    // pieces (cnt, sum_val, cnt_val — the non-null count), and the
    // optimizer answers avg(val) as sum_val/cnt_val and count(val)
    // from cnt_val — correct under NULLs, where count(*) would be
    // wrong. The measure column is deliberately null-bearing, the
    // avg rides the round(6) convention, and answered_from pins that
    // the plan read seg_avg, not the source.
    QueryDef(
      "s_mv_avg_rewrite",
      (s, d) => {
        val root = QueryFixtures.mvAvgLake(s, d)
        graft.plans.MvRewrite.install(s)
        val q = graft.storage.GraftLake.table(s, root, "cust").get
          .groupBy("c_mktsegment")
          .agg(avg(col("val")).as("avg_val"),
            count(col("val")).as("cnt_val"),
            count(lit(1)).as("cnt"))
        val scanned = q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => h.location match {
              case m: graft.storage.ManifestFileIndex => m.lakeTable
              case _ => "?"
            }
            case _ => "?"
          }
        }.toSet
        q.select(col("c_mktsegment"),
            round(col("avg_val").cast("decimal(18,12)"), 6)
              .cast("double").as("avg_val"),
            col("cnt_val"), col("cnt"))
          .withColumn("answered_from", lit(scanned.mkString(",")))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  CAST(ROUND(CAST(AVG(CASE WHEN c_acctbal >= 0
             |      THEN CAST(c_acctbal AS DOUBLE) END)
             |    AS DECIMAL(18,12)), 6) AS DOUBLE) AS avg_val,
             |  CAST(COUNT(CASE WHEN c_acctbal >= 0 THEN 1 END)
             |    AS BIGINT) AS cnt_val,
             |  CAST(COUNT(*) AS BIGINT) AS cnt,
             |  'seg_avg' AS answered_from
             |FROM customer GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // ALTER TABLE RENAME/DROP COLUMN round trip: commit batches, SQL-
    // rename the balance column and drop the segment, read back — the
    // renamed values must hash-equal the source under the new name and
    // the dropped column must be gone (the projection IS the schema).
    // The rewrite preserves partition layout; an equality read after it
    // still prunes by the re-measured stats.
    QueryDef(
      "s_sql_alter_col",
      (s, d) => {
        val root = QueryFixtures.alterBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"ALTER TABLE $cat.default.$t RENAME COLUMN " +
          "c_acctbal TO balance")
        s.sql(s"ALTER TABLE $cat.default.$t DROP COLUMN c_mktsegment")
        s.sql(s"""SELECT c_custkey, balance FROM $cat.default.$t
                 |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal AS balance FROM customer
             |ORDER BY c_custkey""".stripMargin)),

    // O(1)-JOBS BULK REWRITE round trip: an 8-batch lake (above the
    // bulk threshold, so both mutations take rewritePartitionsBulk's
    // one-read + one-staged-write + one-grouped-stats + one-CAS
    // pipeline instead of 2 Spark jobs per partition) — a skipping-
    // aware DELETE of an interior range, then a conditional UPDATE of
    // the high tail, read back. The oracle is the plain CASE-filter
    // composition; partition names, merge-on-read semantics, and
    // per-partition stats all survive the bulk path under the hash
    // gate. Route pinned by BulkRewriteSpec's job-count test.
    QueryDef(
      "s_bulk_rewrite",
      (s, d) => {
        val root = QueryFixtures.rewrite8Base(s, d)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        graft.storage.TxnCatalog.deleteWhere(s, root, t,
          "c_acctbal", 0.0, 2000.0)
        graft.storage.TxnCatalog.updateWhere(s, root, t,
          "c_acctbal >= 8000.0",
          Seq("c_acctbal" -> "c_acctbal + 100000.0"),
          bounds = Seq(("c_acctbal", 8000.0, 10000.0)))
        graft.storage.TxnCatalog.read(s, root, t).get
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal >= 8000.0 THEN c_acctbal + 100000.0
             |       ELSE c_acctbal END AS c_acctbal
             |FROM customer
             |WHERE NOT (c_acctbal BETWEEN 0.0 AND 2000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // ALTER COLUMN TYPE widening round trip (VERDICT r8 task #6):
    // the key was committed NARROW (int32 parquet); one MANIFEST-ONLY
    // widen (a zero-row schema batch — no data rewritten) declares it
    // BIGINT, an INSERT lands a key only the wide type can hold, and
    // the read back serves old int32 files and the new int64 batch
    // through one widened schema (Spark's parquet up-cast + the
    // engine's width-tolerant footer merge). Oracle: the same rows
    // with the key plainly cast.
    QueryDef(
      "s_sql_widen_col",
      (s, d) => {
        val root = QueryFixtures.widenBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"ALTER TABLE $cat.default.$t ALTER COLUMN c_custkey " +
          "TYPE BIGINT")
        s.sql(s"INSERT INTO $cat.default.$t VALUES " +
          "(CAST(5000000001 AS BIGINT), CAST(42.5 AS DOUBLE))")
        s.sql(s"""SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
                 |FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
             |FROM (SELECT c_custkey, c_acctbal FROM customer
             |      UNION ALL VALUES (5000000001, 42.5))
             |ORDER BY c_custkey""".stripMargin)),

    // RENAME TABLE round trip: clone, `ALTER TABLE ... RENAME TO` (one
    // zero-copy manifest commit: clone-by-reference under the new name
    // + old-name drop in the same txn), then INSERT into and read from
    // the NEW name — the rows must hash-equal the source plus the
    // insert, proving entries, schema, stats config, and writability
    // all survived the rename without a byte of data copied.
    QueryDef(
      "s_sql_rename",
      (s, d) => {
        val root = QueryFixtures.alterBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"ALTER TABLE $cat.default.$t RENAME TO ${t}_r")
        s.sql(s"INSERT INTO $cat.default.${t}_r VALUES " +
          "(CAST(7000000001 AS BIGINT), 'MACHINERY', " +
          "CAST(1.5 AS DOUBLE))")
        s.sql(s"""SELECT c_custkey, c_mktsegment, c_acctbal
                 |FROM $cat.default.${t}_r
                 |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal
             |FROM (SELECT c_custkey, c_mktsegment, c_acctbal
             |      FROM customer
             |      UNION ALL
             |      SELECT CAST(7000000001 AS BIGINT),
             |        'MACHINERY', CAST(1.5 AS DOUBLE))
             |ORDER BY c_custkey""".stripMargin)),

    // COLUMN DEFAULT VALUES round trip: the base table was declared
    // with `DEFAULT`s at CREATE and bulk-filled with ONLY the key
    // column (every status/score in it came from the persisted
    // defaults, filled at write time). Per iteration: clone, flip the
    // status default with ALTER COLUMN SET DEFAULT (properties-only —
    // no committed file is touched), land one omitted-column INSERT
    // and one explicit-DEFAULT-keyword INSERT, then ADD COLUMN ...
    // DEFAULT (the TWO-DEFAULT model: every row committed so far
    // PREDATES the column and must read the frozen exists-default, not
    // NULL — no file is rewritten), land one post-alter INSERT with an
    // explicit tier, read back. The oracle states the fill rules
    // relationally: old rows keep the CREATE default, new rows take
    // the flipped one, and every pre-alter row reads 'bronze'.
    QueryDef(
      "s_sql_defaults",
      (s, d) => {
        val root = QueryFixtures.defaultsBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"ALTER TABLE $cat.default.$t ALTER COLUMN status " +
          "SET DEFAULT 'redo'")
        s.sql(s"INSERT INTO $cat.default.$t (c_custkey) " +
          "VALUES (6000000001)")
        s.sql(s"INSERT INTO $cat.default.$t VALUES " +
          "(6000000002, DEFAULT, CAST(9.0 AS DOUBLE))")
        s.sql(s"ALTER TABLE $cat.default.$t ADD COLUMN tier STRING " +
          "DEFAULT 'bronze'")
        s.sql(s"INSERT INTO $cat.default.$t VALUES " +
          "(6000000003, 'done', CAST(3.0 AS DOUBLE), 'gold')")
        s.sql(s"""SELECT c_custkey, status, score, tier
                 |FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             |  'new' AS status, CAST(0.5 AS DOUBLE) AS score,
             |  'bronze' AS tier
             |FROM customer
             |UNION ALL
             |SELECT * FROM (VALUES
             |  (CAST(6000000001 AS BIGINT), 'redo',
             |   CAST(0.5 AS DOUBLE), 'bronze'),
             |  (CAST(6000000002 AS BIGINT), 'redo',
             |   CAST(9.0 AS DOUBLE), 'bronze'),
             |  (CAST(6000000003 AS BIGINT), 'done',
             |   CAST(3.0 AS DOUBLE), 'gold'))
             |ORDER BY c_custkey""".stripMargin)),

    // GENERATED ALWAYS AS round trip: the base table's bucket column
    // was NEVER provided by any writer — the insert path computed
    // every stored value from the declared expression (and the auto
    // CHECK constraint has enforced the invariant on every commit).
    // Per iteration: clone, land one omitted-column INSERT and one
    // matching-value INSERT, read back. The oracle recomputes the
    // expression relationally — if any write path had stored a stale
    // or wrong value, the hash gate catches it here.
    QueryDef(
      "s_sql_generated",
      (s, d) => {
        val root = QueryFixtures.generatedBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"INSERT INTO $cat.default.$t (c_custkey, c_acctbal) " +
          "VALUES (CAST(8000000001 AS BIGINT), CAST(2500.0 AS DOUBLE))")
        s.sql(s"INSERT INTO $cat.default.$t VALUES " +
          "(CAST(8000000002 AS BIGINT), CAST(-250.0 AS DOUBLE), " +
          "CAST(-1 AS BIGINT))")
        s.sql(s"""SELECT c_custkey, c_acctbal, bal_bucket
                 |FROM $cat.default.$t ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_acctbal,
             |  CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
             |FROM (SELECT c_custkey, c_acctbal FROM customer
             |      UNION ALL
             |      SELECT CAST(8000000001 AS BIGINT),
             |        CAST(2500.0 AS DOUBLE)
             |      UNION ALL
             |      SELECT CAST(8000000002 AS BIGINT),
             |        CAST(-250.0 AS DOUBLE))
             |ORDER BY c_custkey""".stripMargin)),

    // IDENTITY COLUMNS round trip: the base table's ids were assigned
    // by the insert path over a sorted bulk insert (id == rank by
    // custkey — deterministic by range partitioning + per-partition
    // indexing), and the watermark lives in MANIFEST stats. Per
    // iteration: clone, append one row (takes id = count+1 — the
    // watermark survived the clone), read the full mapping back. The
    // oracle restates assignment relationally: row_number over the
    // same order, count+1 for the appended row.
    QueryDef(
      "s_sql_identity",
      (s, d) => {
        val root = QueryFixtures.identityBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"INSERT INTO $cat.default.$t (c_custkey) " +
          "VALUES (CAST(9000000001 AS BIGINT))")
        s.sql(s"""SELECT id, c_custkey FROM $cat.default.$t
                 |ORDER BY id""".stripMargin)
      },
      Some("""SELECT CAST(row_number() OVER (ORDER BY c_custkey)
             |    AS BIGINT) AS id, c_custkey
             |FROM customer
             |UNION ALL
             |SELECT CAST((SELECT count(*) + 1 FROM customer) AS BIGINT),
             |  CAST(9000000001 AS BIGINT)
             |ORDER BY id""".stripMargin)),

    // ZERO-COPY ONBOARDING round trip (`CALL system.add_files`,
    // Iceberg's add_files): an EXTERNAL parquet directory becomes a
    // lake table in one manifest txn — nothing copied, nothing scanned
    // beyond footers; `analyze` then backfills manifest stats so the
    // imported entries prune like native ones. The read-back must
    // hash-equal the source (proving external resolution end to end)
    // with the entry count pinned; at 100 TB this is the onboarding
    // path: a directory listing + a CAS instead of a full rewrite.
    QueryDef(
      "s_add_files",
      (s, d) => {
        val src = QueryFixtures.extParquetDir(s, d)
        val root = java.nio.file.Files
          .createTempDirectory("qimp").toString
        val cat = QueryFixtures.sqlCatalog(s, root)
        val r = s.sql(s"CALL $cat.system.add_files(table => 'cust', " +
          s"source_path => '$src')").collect().head
        s.sql(s"CALL $cat.system.analyze(table => 'cust', " +
          "stats_columns => 'c_custkey')")
        s.sql(s"""SELECT c_custkey, c_acctbal FROM $cat.default.cust
                 |ORDER BY c_custkey""".stripMargin)
          .withColumn("added_entries", lit(r.getInt(1)))
      },
      Some("""SELECT c_custkey, c_acctbal, 4 AS added_entries
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // HIVE-PARTITIONED zero-copy onboarding (the add_files shape an
    // existing Spark/Hive lake actually has): the source was written by
    // Spark's own partitioned writer over (seg string, bucket long), so
    // the files physically LACK both partition columns — the import
    // synthesizes them from the directory names (types inferred, values
    // recorded as per-entry min=max stats, one manifest txn, nothing
    // copied). The read back is a POINT LOOKUP on both synthesized
    // columns — values must surface typed and exact, and the manifest
    // index prunes to the one owning leaf (pinned by ImporterSpec's
    // numFiles probe); the entry count (5 segments × 2 buckets) rides
    // along pinned.
    QueryDef(
      "s_add_files_hive",
      (s, d) => {
        val src = QueryFixtures.extHiveDir(s, d)
        val root = java.nio.file.Files
          .createTempDirectory("qimph").toString
        val cat = QueryFixtures.sqlCatalog(s, root)
        val r = s.sql(s"CALL $cat.system.add_files(table => 'cust', " +
          s"source_path => '$src')").collect().head
        s.sql(s"""SELECT seg, bucket, c_custkey, c_acctbal
                 |FROM $cat.default.cust
                 |WHERE seg = 'BUILDING' AND bucket = 1
                 |ORDER BY c_custkey""".stripMargin)
          .withColumn("added_entries", lit(r.getInt(1)))
      },
      Some("""SELECT c_mktsegment AS seg,
             |  CAST(c_custkey % 2 AS BIGINT) AS bucket,
             |  c_custkey, c_acctbal, 10 AS added_entries
             |FROM customer
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey % 2 = 1
             |ORDER BY c_custkey""".stripMargin)),

    // ANSI CONSTRAINT DDL round trip: the base table was created with
    // a CHECK (every bulk row passed the staged-bytes funnel at
    // build); per iteration: clone, ADD a second CONSTRAINT (validated
    // against all existing rows before publishing), land a violating
    // INSERT (must refuse — pinned as a constant column) and a passing
    // one, read back. The oracle is the passing relation plus the
    // pinned refusal count: if enforcement ever went soft, either the
    // extra row or the flag breaks the hash.
    QueryDef(
      "s_sql_constraint",
      (s, d) => {
        val root = QueryFixtures.constraintBase(s, d)
        val cat = QueryFixtures.sqlCatalog(s, root)
        val t = QueryFixtures.cloneOf(s, root, "cust")
        s.sql(s"ALTER TABLE $cat.default.$t ADD CONSTRAINT key_pos " +
          "CHECK (c_custkey >= 0)")
        val refused =
          try {
            s.sql(s"INSERT INTO $cat.default.$t VALUES " +
              "(CAST(-5 AS BIGINT), CAST(1.0 AS DOUBLE))")
            0
          } catch { case _: Exception => 1 }
        s.sql(s"INSERT INTO $cat.default.$t VALUES " +
          "(CAST(9000000077 AS BIGINT), CAST(7.5 AS DOUBLE))")
        s.sql(s"""SELECT c_custkey, c_acctbal FROM $cat.default.$t
                 |ORDER BY c_custkey""".stripMargin)
          .withColumn("refused", lit(refused))
      },
      Some("""SELECT c_custkey, c_acctbal, 1 AS refused
             |FROM (SELECT c_custkey, c_acctbal FROM customer
             |      UNION ALL
             |      SELECT CAST(9000000077 AS BIGINT),
             |        CAST(7.5 AS DOUBLE))
             |ORDER BY c_custkey""".stripMargin)),

    // TAGS round trip (Iceberg tags on the txn axis): commit the full
    // customer set, CALL tag it, destructively overwrite the table,
    // vacuum with keep=1 — the tagged txn is EXEMPT, so reading
    // `VERSION AS OF 'stable'` afterwards must hash-equal the original
    // source even though every untagged old txn was reclaimed. The
    // kept-txn count rides along pinned, proving the vacuum actually
    // ran hard.
    QueryDef(
      "s_tag_read",
      (s, d) => {
        // base hardlink-copied per iteration: the hard vacuum is ROOT-
        // scoped, so each iteration tags/overwrites/vacuums privately
        val root = QueryFixtures.linkCopy(QueryFixtures.tagTemplate(s, d))
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val cat = QueryFixtures.sqlCatalog(s, root)
        s.sql(s"CALL $cat.system.tag(name => 'stable')")
        // destroy: shrink the live table to one row, then vacuum hard
        graft.storage.TxnCatalog.commit(s, root,
          Seq(("cust", cust.limit(1))))
        graft.storage.TxnCatalog.vacuum(s, root, keep = 1)
        val kept = graft.storage.TxnCatalog.txns(s, root).size
        s.sql(s"""SELECT c_custkey, c_acctbal
                 |FROM $cat.default.cust VERSION AS OF 'stable'
                 |""".stripMargin)
          .withColumn("kept_txns", lit(kept))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, 2 AS kept_txns FROM customer
             |ORDER BY c_custkey""".stripMargin)),

    // BRANCH write-audit-publish round trip (Iceberg table branches +
    // the WAP pattern, zero-copy on this catalog): commit the even keys
    // to main, fork branch 'wap', stage the odd keys ON THE BRANCH,
    // audit (main must still hold only the even rows — pinned as a
    // constant column), then publish. The published read must
    // hash-equal the full source, the publish must classify as
    // APPEND-SHAPED (no restore marker — streams keep running), and
    // main's pre-publish isolation count rides the result.
    QueryDef(
      "s_branch_wap",
      (s, d) => {
        // evens-only base hardlink-copied per iteration: the branch
        // name and fast-forward base txn must be private to each run
        val root = QueryFixtures.linkCopy(QueryFixtures.wapTemplate(s, d))
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        graft.storage.Branch.create(s, root, "cust", "wap")
        val shadow = graft.storage.Branch.shadowName("cust", "wap")
        graft.storage.TxnCatalog.appendBatch(s, root, shadow, "odd",
          cust.filter(pmod(col("c_custkey"), lit(2)) === 1),
          statsColumns = Seq("c_custkey"))
        val mainBefore = graft.storage.TxnCatalog
          .read(s, root, "cust").get.count()
        graft.storage.Branch.publish(s, root, "cust", "wap")
        val appendShaped = !graft.storage.TxnCatalog
          .tableProperties(s, root, "cust")
          .contains(graft.storage.TxnCatalog.RestoreTxnProp)
        graft.storage.TxnCatalog.read(s, root, "cust").get
          .withColumn("main_before", lit(mainBefore))
          .withColumn("append_shaped", lit(appendShaped))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
             |   WHERE c_custkey % 2 = 0) AS main_before,
             |  TRUE AS append_shaped
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // BRANCH REBASE under a concurrent main writer — the WAP shape
    // production actually has (Branch.rebase three-way merge): evens on
    // main, fork 'wap', then main lands mod4==1 WHILE the branch stages
    // mod4==3. Publish must REFUSE (main advanced — pinned as
    // needed_rebase), `CALL system.rebase_branch` must merge both
    // sides' disjoint partitions zero-copy, and the post-rebase publish
    // must fast-forward APPEND-SHAPED (both carried sides resolve to
    // main's own paths; only the branch's staged partition is new).
    // The published table must hash-equal the full source.
    QueryDef(
      "s_branch_rebase",
      (s, d) => {
        val root = QueryFixtures.linkCopy(QueryFixtures.wapTemplate(s, d))
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        graft.storage.Branch.create(s, root, "cust", "wap")
        val shadow = graft.storage.Branch.shadowName("cust", "wap")
        // main advances while the branch stages
        graft.storage.TxnCatalog.commitPartitions(s, root,
          Seq(("cust", "m",
            cust.filter(pmod(col("c_custkey"), lit(4)) === 1))),
          statsColumns = Seq("c_custkey"))
        graft.storage.TxnCatalog.appendBatch(s, root, shadow, "w",
          cust.filter(pmod(col("c_custkey"), lit(4)) === 3),
          statsColumns = Seq("c_custkey"))
        val neededRebase =
          try { graft.storage.Branch.publish(s, root, "cust", "wap"); false }
          catch { case _: IllegalStateException => true }
        val cat = QueryFixtures.sqlCatalog(s, root)
        s.sql(s"CALL $cat.system.rebase_branch(" +
          "table => 'cust', name => 'wap')")
        graft.storage.Branch.publish(s, root, "cust", "wap")
        val appendShaped = !graft.storage.TxnCatalog
          .tableProperties(s, root, "cust")
          .contains(graft.storage.TxnCatalog.RestoreTxnProp)
        graft.storage.TxnCatalog.read(s, root, "cust").get
          .withColumn("needed_rebase", lit(neededRebase))
          .withColumn("append_shaped", lit(appendShaped))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
             |  TRUE AS needed_rebase, TRUE AS append_shaped
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // CATALOG BRANCH (Nessie-style whole-catalog WAP): fork BOTH tables
    // of a two-table lake with one commit, stage the odd customers and
    // half the odd orders on the branch WHILE main lands the other half
    // of the odd orders, then heal with rebase_catalog and cut over
    // with publish_catalog — ONE commit moves both tables (pinned:
    // one_commit compares the txn counter across the publish). The
    // result joins the published tables, so any cross-table tearing or
    // lost row breaks the hash against a plain customer⋈orders oracle.
    QueryDef(
      "s_catalog_branch",
      (s, d) => {
        val root =
          QueryFixtures.linkCopy(QueryFixtures.catalogWapTemplate(s, d))
        val cust = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val cat = QueryFixtures.sqlCatalog(s, root)
        s.sql(s"CALL $cat.system.branch_catalog(name => 'wap')")
        // main advances on ord while the branch stages both tables
        graft.storage.TxnCatalog.commitPartitions(s, root,
          Seq(("ord", "m",
            ord.filter(pmod(col("o_orderkey"), lit(4)) === 1))))
        graft.storage.TxnCatalog.appendBatch(s, root,
          graft.storage.Branch.shadowName("cust", "wap"), "w",
          cust.filter(pmod(col("c_custkey"), lit(2)) === 1),
          statsColumns = Seq("c_custkey"))
        graft.storage.TxnCatalog.appendBatch(s, root,
          graft.storage.Branch.shadowName("ord", "wap"), "w",
          ord.filter(pmod(col("o_orderkey"), lit(4)) === 3),
          statsColumns = Seq("o_orderkey"))
        val neededRebase =
          try {
            graft.storage.Branch.publishAll(s, root, "wap"); false
          } catch { case _: IllegalStateException => true }
        s.sql(s"CALL $cat.system.rebase_catalog(name => 'wap')")
        val before = graft.storage.TxnCatalog.currentTxn(s, root).get
        s.sql(s"CALL $cat.system.publish_catalog(name => 'wap')")
        val oneCommit =
          graft.storage.TxnCatalog.currentTxn(s, root).get == before + 1
        val pc = graft.storage.TxnCatalog.read(s, root, "cust").get
        val po = graft.storage.TxnCatalog.read(s, root, "ord").get
        pc.join(po, pc("c_custkey") === po("o_custkey"))
          .groupBy("c_custkey", "c_acctbal")
          .agg(count("o_orderkey").as("num_orders"))
          .withColumn("needed_rebase", lit(neededRebase))
          .withColumn("one_commit", lit(oneCommit))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
             |  CAST(COUNT(o_orderkey) AS BIGINT) AS num_orders,
             |  TRUE AS needed_rebase, TRUE AS one_commit
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_acctbal
             |ORDER BY c_custkey""".stripMargin)),

    // S5: content-addressed object keys; multi-dot filenames keep only the
    // final extension (fixes §2.3.7).
    QueryDef(
      "s5_content_key",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            CatalogOps.contentKey(
              lit("lake"), col("text").cast("binary"),
              concat(lit("doc."), col("doc_id"), lit(".v2.txt"))).as("key"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, 'lake/' || md5(text) || '.txt' AS key
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
