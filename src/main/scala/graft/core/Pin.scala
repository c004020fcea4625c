package graft.core

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Session-wide persist() hygiene for multi-reference subtrees.
  *
  * Two hazards of a bare `df.persist()` inside a QueryDef, both measured
  * in rounds 9-10:
  *
  *  1. CROSS-QUERY PLAN SUBSTITUTION. persist() registers the ANALYZED
  *     plan with the session-wide CacheManager, and Verify/Bench/ScaleSpec
  *     run hundreds of queries in ONE session — any later query whose plan
  *     contains a canonically IDENTICAL subtree gets InMemoryTableScan
  *     silently substituted, changing its plan shape (round 10:
  *     lsh_recall_eval's pinned shingle frame broke ScaleSpec's
  *     ReusedExchange guard on minhash_lsh_pairs). [[tagged]] defends by
  *     construction: a `cache_tag` marker column makes the cached plan
  *     canonically DISTINCT from any bare subtree, and the returned view
  *     prunes the marker so consumers are unchanged. Two queries that
  *     DELIBERATELY share a frame (dup_span_runs/dup_max_spans) still
  *     dedup to one cache entry — their tagged plans are identical too.
  *
  *  2. STORAGE LEAK ACROSS A SESSION. A QueryDef returns a lazy frame, so
  *     there is no "after the action" point inside the fn to unpersist —
  *     pins accumulated for the whole life of a Verify session (253
  *     queries). Every pin now also registers here, and the HARNESS
  *     releases: Verify calls [[releaseAll]] after each query's action.
  *     Bench deliberately does NOT release between queries — its 2-pass
  *     min relies on pass-2 reusing pass-1's cache, its shard JVMs are
  *     short-lived (≤ 50 queries), and MEMORY_AND_DISK entries are
  *     LRU-evictable under pressure anyway.
  *
  * Both entry points are the ONLY sanctioned persist() call sites in
  * src/main (ScaleSpec's persist-discipline scan enforces this). Since
  * round 17 ccOverEdges' symmetrized adjacency also goes through
  * [[tagged]] (it was the one self-released bare-persist exemption):
  * the CC family's callers hand it canonically identical edge plans,
  * so the session-lived pin lets bench pass 2 and co-sharded family
  * members skip the signature pipeline feeding it.
  */
object Pin {

  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` behind a `cache_tag` marker column and return the
    * tag-free view. Use for any frame whose subtree could also appear in
    * OTHER queries' plans (corpus scans, shared shingle/word frames).
    */
  def tagged(df: DataFrame): DataFrame = {
    val p = df.withColumn("cache_tag", lit(1)).persist()
    live.add(p)
    p.drop("cache_tag")
  }

  /** Persist `df` as-is and register it for release. Use ONLY for frames
    * whose plan cannot recur in another query (e.g. one-row per-round
    * winner frames of an unrolled loop, which already embed a tagged
    * parent and round-specific literals).
    */
  def pin(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Number of registered, not-yet-released pins (test observability). */
  def liveCount: Int = live.size()

  /** Unpersist (non-blocking) every registered pin. Idempotent; called by
    * Verify after each query's action and by tests.
    */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) {
      // NonFatal only: a blanket Throwable here would swallow VM errors
      // (OOM) and InterruptedException mid-release in a 250-query Verify
      // session, surfacing later as an unrelated failure. Log and keep
      // draining on the recoverable ones; let fatal errors propagate.
      try d.unpersist(false)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[Pin] unpersist failed: $e")
      }
      d = live.poll()
    }
  }
}
