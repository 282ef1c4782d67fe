package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.storage.TxnCatalog

/** Process-lifetime cache of the temp LAKES the storage round-trip
  * queries read (VERDICT r7 task #2): several queries exercised
  * byte-identical commit→cluster builds, and the bench re-built them
  * every iteration — ~17% of warm bench wall was lake construction, not
  * the reads under test. Each fixture builds its lake ONCE per
  * (version, sfDir) per JVM — the FIRST caller still pays (and
  * therefore still measures) the full round trip; sharers and later
  * iterations measure what the query actually claims to test, the
  * pruned read. Semantics and oracles are unchanged: every fixture is
  * READ-ONLY after construction (mutation-shaped fixtures — deletes,
  * re-inserts — bake the mutation into the build), so repeated reads
  * are deterministic.
  *
  * The cache key carries a VERSION string — bump it when a build's
  * shape changes so stale lakes from an older definition can never
  * serve a newer query. */
object QueryFixtures {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def fixture(kind: String, sfDir: String)(
      build: String => Unit): String =
    cache.getOrElseUpdate((kind, sfDir), {
      val root = java.nio.file.Files
        .createTempDirectory(s"qfix_$kind").toString
      build(root)
      root
    })

  /** Customer lake, Z-clustered on (c_acctbal, c_custkey): 6 hash-split
    * batches (arrival stats prune nothing), then one clustering pass —
    * the shared build behind `s_zorder_skipping` (readWhere API axis)
    * and `s_catalyst_skipping` (Catalyst-planned axis). */
  def custZLake(s: SparkSession, sfDir: String): String =
    fixture("custz-v1", sfDir) { root =>
      val cust = Tables.customer(s, sfDir)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      val n = 6
      TxnCatalog.commitPartitions(s, root,
        (0 until n).map(k => ("cust", s"batch=$k",
          cust.filter(pmod(col("c_custkey"), lit(n)) === k))),
        statsColumns = Seq("c_custkey", "c_acctbal", "c_mktsegment"))
      TxnCatalog.clusterPartitions(s, root, "cust",
        (0 until n).map(k => s"batch=$k"), "z=",
        "c_acctbal", "c_custkey", buckets = 8, bits = 6)
      ()
    }

  /** Parts lake with per-partition Blooms on the key: 4 overlapping
    * hash-split batches — the shared build behind `s_bloom_point_lookup`
    * and `s_in_skipping`. */
  def partsBloomLake(s: SparkSession, sfDir: String): String =
    fixture("partsbloom-v1", sfDir) { root =>
      val parts = Tables.part(s, sfDir).select("p_partkey", "p_name")
      TxnCatalog.commitPartitions(s, root,
        (0 until 4).map(k => ("parts", s"batch=$k",
          parts.filter(pmod(col("p_partkey"), lit(4)) === k))),
        statsColumns = Seq("p_partkey"),
        bloomColumns = Seq("p_partkey"))
      ()
    }

  /** [[partsBloomLake]]'s build PLUS the merge-on-read history
    * `s_delete_keys` asserts: equality-delete three keys, then re-insert
    * one in a newer batch. Read-only afterwards — every read replays the
    * delete-then-reinsert sequence semantics. */
  def partsDeleteKeysLake(s: SparkSession, sfDir: String): String =
    fixture("partsdelkeys-v1", sfDir) { root =>
      import s.implicits._
      val parts = Tables.part(s, sfDir).select("p_partkey", "p_name")
      TxnCatalog.commitPartitions(s, root,
        (0 until 4).map(k => ("parts", s"batch=$k",
          parts.filter(pmod(col("p_partkey"), lit(4)) === k))),
        statsColumns = Seq("p_partkey"),
        bloomColumns = Seq("p_partkey"))
      TxnCatalog.deleteKeys(s, root, "parts",
        "p_partkey", Seq(42L, 77L, 4242L).toDF("p_partkey"))
      TxnCatalog.commitPartitions(s, root,
        Seq(("parts", "batch=re",
          parts.filter(col("p_partkey") === 42L))),
        statsColumns = Seq("p_partkey"))
      ()
    }

  /** Customer lake after a POSITIONAL delete (deletion vector): 3
    * hash-split batches, then one `deletePositions` with a multi-column
    * OR predicate — the DELETE shape neither equality keys nor a
    * single-axis range rewrite can address. No data file is rewritten;
    * the vector is pending, so every read replays the (file, row)
    * anti-join merge-on-read. */
  def custDvDeleteLake(s: SparkSession, sfDir: String): String =
    fixture("custdv-v1", sfDir) { root =>
      val cust = Tables.customer(s, sfDir)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      TxnCatalog.commitPartitions(s, root,
        (0 until 3).map(k => ("cust", s"batch=$k",
          cust.filter(pmod(col("c_custkey"), lit(3)) === k))),
        statsColumns = Seq("c_custkey", "c_acctbal"))
      TxnCatalog.deletePositions(s, root, "cust",
        (col("c_acctbal") > 5000.0 && col("c_mktsegment") === "BUILDING") ||
          (col("c_acctbal") < 0.0 && col("c_mktsegment") === "AUTOMOBILE"))
      ()
    }

  /** Customer lake after a skipping-aware `deleteWhere` — the rewrite
    * happened once at build; reads assert the surviving complement. */
  def custDeleteWhereLake(s: SparkSession, sfDir: String): String =
    fixture("custdelwhere-v1", sfDir) { root =>
      val cust = Tables.customer(s, sfDir).select("c_custkey", "c_acctbal")
      val n = 4
      TxnCatalog.commitPartitions(s, root,
        (0 until n).map(k => ("cust", s"batch=$k",
          cust.filter(pmod(col("c_custkey"), lit(n)) === k))),
        statsColumns = Seq("c_custkey", "c_acctbal"))
      TxnCatalog.deleteWhere(s, root, "cust", "c_acctbal", 0.0, 4000.0)
      ()
    }
}
