package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Deterministic block release for `localCheckpoint`'d loop state.
  *
  * `Dataset.unpersist` only removes CacheManager entries; the RDD blocks a
  * `localCheckpoint()` persists are registered with the SparkContext, not
  * the cache manager, so calling `unpersist()` on a checkpointed Dataset
  * is a silent no-op and its blocks linger in executor storage until the
  * ContextCleaner notices the backing RDD was garbage-collected. For a
  * one-shot operator that is merely lazy cleanup; for the ITERATIVE
  * operators (PageRank, connected components, label propagation, HITS,
  * k-core, BFS) every round checkpoints a fresh state, so a long session
  * accumulates one dead round-state per round per query until a JVM GC
  * happens to run — exactly the memory pressure the explicit cleanup
  * calls were written to prevent.
  *
  * [[tracked]] captures the id of the RDD the eager checkpoint registers
  * (the `getPersistentRDDs` delta across the call) and returns a
  * [[Ckpt.Handle]] whose `release()` unpersists those blocks directly.
  *
  * Safety contract: an unreliable (local) checkpoint is UNRECOMPUTABLE
  * once its blocks are dropped — only release a state none of your live
  * datasets still read. Checkpoints are eager, so "the next round's state
  * has materialized" is exactly that proof: round i+1's blocks exist and
  * no longer read round i's. The id capture assumes no concurrent thread
  * persists an RDD inside the call window (true for this library's
  * single-threaded query construction; a wrongly-captured id would at
  * worst release a cache early, never corrupt a result).
  */
object Ckpt {

  /** Releases the checkpoint blocks captured by [[tracked]]. Idempotent;
    * releasing after the owning RDD was already cleaned is a no-op. */
  final class Handle private[Ckpt] (sc: SparkContext, ids: Set[Int]) {
    def release(): Unit =
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }

  private val noop = new Handle(null, Set.empty)

  /** Eagerly-materialized `localCheckpoint()` plus a handle that really
    * frees its blocks. The id capture brackets the LAZY checkpoint call —
    * which registers exactly the checkpoint's backing RDD and runs no
    * job — and materialization happens afterwards, OUTSIDE the window:
    * an eager checkpoint's materialization job can populate `.cache()`d
    * subtrees (loop invariants like label propagation's symmetrized edge
    * set, or the similarity memo caches), and those register with the
    * context mid-job — capturing around the eager call would adopt a
    * LIVE cache into the handle and `release()` would silently evict it,
    * forcing every later round to recompute the invariant. */
  def tracked(df: DataFrame): (DataFrame, Handle) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(eager = false)
    val ids = sc.getPersistentRDDs.keySet.diff(before).toSet
    out.count()
    (out, new Handle(sc, ids))
  }

  /** A handle that releases nothing — the initial value for loop-state
    * handle vars whose first state is not checkpointed. */
  def empty: Handle = noop
}
