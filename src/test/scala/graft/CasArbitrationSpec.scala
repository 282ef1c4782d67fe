package graft

import java.nio.file.Files
import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import graft.storage.TxnCatalog

/** The manifest-publish CAS under a FORCED two-writer collision: both
  * writers stage, then align at the pre-publish seam so they race the
  * SAME txn number microseconds apart. Exactly one must win every
  * round — on the local filesystem this is only true with atomic
  * no-overwrite arbitration (hardlink): plain exists+rename is POSIX
  * rename(2), which replaces the winner's manifest silently and loses
  * its commit (the 5-of-6 racing INSERTs failure this spec pins). */
class CasArbitrationSpec extends GraftSuite {
  import spark.implicits._

  test("aligned racing commits: exactly one wins each txn, nothing lost") {
    val root = Files.createTempDirectory("castoctou").toFile.getAbsolutePath
    TxnCatalog.commitPartitions(spark, root,
      Seq(("ev", "b=seed", Seq((0L, "seed")).toDF("k", "nm"))))
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    val rounds = 20
    try {
      (1 to rounds).foreach { r =>
        val barrier = new CyclicBarrier(2)
        def attempt(tag: String): Future[Boolean] = Future {
          try {
            TxnCatalog.commitPartitionsHooked(spark, root,
              Seq(("ev", s"r$r-$tag",
                Seq((r.toLong, tag)).toDF("k", "nm"))))(
              () => barrier.await(30, TimeUnit.SECONDS))
            true
          } catch {
            case _: java.io.IOException => false // lost the CAS cleanly
          }
        }
        val results = Await.result(
          Future.sequence(Seq(attempt("a"), attempt("b"))),
          Duration(120, "s"))
        assert(results.count(identity) === 1,
          s"round $r: exactly one aligned writer must win, got $results")
      }
    } finally pool.shutdown()
    // every winner's partition is live; nothing was silently replaced
    val parts = TxnCatalog.partitions(spark, root, "ev")
    assert(parts.size === 1 + rounds,
      s"one landed partition per round plus the seed, got ${parts.size}")
    assert(TxnCatalog.read(spark, root, "ev").get.count() === (1 + rounds).toLong)
    // and the manifest chain is dense: one committed txn per win
    assert(TxnCatalog.txns(spark, root).size === 1 + rounds)
  }
}
