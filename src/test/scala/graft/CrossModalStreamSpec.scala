package graft

import graft.streaming.EventStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The cross-modal gate's streaming twin (round-15 verdict task 7):
  * per the round-13 twin rule, every expectation here is derived from
  * the BATCH query's row semantics — the final streamed snapshot must
  * equal `cross_modal_check`'s output on the same document set, at all
  * three fixture SFs, across arbitrary micro-batch splits (including
  * splits that force CROSS-BATCH cluster growth and root MERGES, the
  * cases a star-per-batch shortcut would get wrong).
  */
class CrossModalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def docsOf(dir: String): DataFrame =
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))

  private def finalVerdicts(stateDir: String): DataFrame =
    EventStream.crossModalVerdicts(spark, stateDir)

  private def batchWant(dir: String) =
    graft.ops.Multimodal.crossModalCheck.fn(spark, dir)
      .as[(Long, Long, Long, Option[Int], Boolean)].collect().toSet

  test("streamed verdicts == batch cross_modal_check at three SFs (mod-3 batches)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val stateDir = tmp(s"graft_xm_state_$sf")
      val docs = docsOf(dir)
      (0L to 2L).foreach { b =>
        EventStream.mergeCrossModalSnapshot(
          docs.filter(col("doc_id") % 3 === b), stateDir, b)
      }
      val got = finalVerdicts(stateDir)
        .as[(Long, Long, Long, Option[Int], Boolean)].collect().toSet
      val want = batchWant(dir)
      assert(got === want,
        s"$sf: streamed snapshot != batch cross_modal_check " +
          s"(missing=${(want -- got).take(3)} extra=${(got -- want).take(3)})")
      // non-vacuity of the INCREMENTAL path: at least one emitted
      // cluster must span two different arrival batches (doc_id mod 3),
      // i.e. the verdict really crossed micro-batch state
      assert(want.exists { case (d, c, _, _, _) => d % 3 != c % 3 },
        s"$sf: every cluster arrived inside one batch — split is vacuous")
    }
  }

  test("root MERGE across batches: replayed batch rewrites, final state exact") {
    // Adversarial split: reverse arrival order (descending doc_id
    // thirds), so cluster roots FALL over time — early arrivals form
    // components under interim roots that later, smaller-id arrivals
    // must take over (the old-root → new-root remap path), and bridge
    // docs can merge two existing components. Then replay the LAST
    // batch id on top of its own output (the crash-before-commit
    // shape): the `< id` snapshot cut must make the rewrite idempotent.
    val dir = sfDir
    val stateDir = tmp("graft_xm_merge")
    val docs = docsOf(dir)
    val splits = Seq(
      docs.filter(col("doc_id") % 3 === 2),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 0))
    splits.zipWithIndex.foreach { case (b, i) =>
      EventStream.mergeCrossModalSnapshot(b, stateDir, i.toLong)
    }
    // interim roots must actually have fallen at least once: some final
    // cluster_id (global min id) arrived LATER than another member
    val want = batchWant(dir)
    assert(want.exists { case (d, c, _, _, _) => c % 3 == 0L && d % 3 != 0L },
      "adversarial split produced no late-arriving root — merge path unexercised")
    val before = finalVerdicts(stateDir)
      .as[(Long, Long, Long, Option[Int], Boolean)].collect().toSet
    assert(before === want, "descending-order stream diverged from batch")
    // replay batch 2
    EventStream.mergeCrossModalSnapshot(splits(2), stateDir, 2L)
    val after = finalVerdicts(stateDir)
      .as[(Long, Long, Long, Option[Int], Boolean)].collect().toSet
    assert(after === want, "replayed batch diverged (idempotency broken)")
  }

  test("late-arriving longest member RE-ELECTS the canonical (and its phash)") {
    // Planted adversary: docs A and B (near-identical word sets, so the
    // MinHash bands co-bucket them) arrive first — B is longer, so B is
    // canonical and A's verdict compares against B's phash. Then C
    // arrives: near-dup of both and LONGEST — the batch election rule
    // (n_chars desc, doc_id asc) now makes C canonical, so the snapshot
    // must RE-emit A and B against C's phash and retire the old
    // (A vs B) verdict. A snapshot that only appends verdicts for NEW
    // arrivals would keep the stale row — this pins the re-election.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docA = (1L, s"$base alpha", (base.length + 6).toLong)
    val docB = (2L, s"$base beta gamma", (base.length + 11).toLong)
    val docC = (3L, s"$base beta gamma delta epsilon zeta", // longest
      (base.length + 31).toLong)
    val stateDir = tmp("graft_xm_reelect")
    import org.apache.spark.sql.functions.{col => c}
    EventStream.mergeCrossModalSnapshot(
      Seq(docA, docB).toDF("doc_id", "text", "n_chars"), stateDir, 0L)
    val after1 = EventStream.crossModalVerdictsAt(spark, stateDir, 1L)
      .as[(Long, Long, Long, Option[Int], Boolean)].collect().toSet
    // non-vacuity: the planted texts must actually have co-bucketed
    assert(after1.map(v => (v._1, v._3)) === Set((1L, 2L)),
      s"planted near-dups failed to cluster in batch 0: $after1")
    EventStream.mergeCrossModalSnapshot(
      Seq(docC).toDF("doc_id", "text", "n_chars"), stateDir, 1L)
    val after2 = EventStream.crossModalVerdictsAt(spark, stateDir, 2L)
      .as[(Long, Long, Long, Option[Int], Boolean)].collect().toSet
    assert(after2.map(v => (v._1, v._3)) === Set((1L, 3L), (2L, 3L)),
      s"canonical not re-elected to the late-arriving longest doc: $after2")
    // and the whole snapshot equals the batch query's semantics on the
    // union — derived expectation, the round-13 twin rule
    assert(after2.map(_._2) === Set(1L), "cluster root must be the min id")
  }

  test("end-to-end stream wiring: file-per-trigger micro-batches") {
    val dir = sfDir
    val stage = tmp("graft_xm_src")
    docsOf(dir).repartition(3).write.mode("overwrite").parquet(stage)
    val stateDir = tmp("graft_xm_e2e_state")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, n_chars LONG")
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = EventStream.crossModalStream(stream, stateDir, tmp("graft_xm_ck"))
    try q.processAllAvailable() finally q.stop()
    val got = finalVerdicts(stateDir)
      .as[(Long, Long, Long, Option[Int], Boolean)].collect().toSet
    assert(got === batchWant(dir), "end-to-end streamed state != batch")
  }
}
