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
  * [[tracked]] reads the checkpoint's backing RDD id DIRECTLY off the
  * returned plan (the `LogicalRDD` the checkpoint wraps) and returns a
  * [[Ckpt.Handle]] whose `release()` unpersists those blocks directly.
  * It must NOT be captured as a registration-window diff around the
  * call: even the lazy `localCheckpoint(eager = false)` builds the
  * physical RDD DAG inside the call, and constructing an
  * InMemoryTableScan persist-registers its cache BUFFER RDD with the
  * context right there (under AQE the call can even run whole stage
  * jobs) — so a window diff ADOPTS any live `.cache()`/memo buffer the
  * tracked plan reads first, and `release()` then evicts it
  * permanently (the buffer builder is a lazy val; the storage level
  * never comes back). Measured: HITS re-ran the annPairs cosine verify
  * every half-round and the whole graph family's rerun medians sat ~2×
  * their round-11 values until the window capture was replaced.
  *
  * Safety contract: an unreliable (local) checkpoint is UNRECOMPUTABLE
  * once its blocks are dropped — only release a state none of your live
  * datasets still read. Checkpoints are eager, so "the next round's state
  * has materialized" is exactly that proof: round i+1's blocks exist and
  * no longer read round i's. Direct id capture is per-Dataset, so
  * concurrent `tracked` calls on other threads can never cross-adopt
  * each other's RDDs.
  */
object Ckpt {

  /** Mechanical enforcement of the safety contract above: every cache /
    * memo in the codebase that stores a DataFrame it hands out to
    * external callers registers it here (and unregisters on eviction).
    * [[Handle.release]] refuses — loudly — to free blocks whose RDD id
    * is still referenced by a registered cache entry: a tracked
    * checkpoint read by a cached frame is unrecomputable once released,
    * so release-under-registration is always a latent use-after-free
    * (exactly the round-12 kmCache bug). The check is a few integer-set
    * probes per release; it stays on in production. */
  // Keyed by (owning SparkContext, RDD id): RDD ids restart from 0 in a
  // fresh context, so an unscoped registry left dirty by a session that
  // died without clearCaches could alias a NEW context's ids and fail an
  // unrelated release.
  private val cachedReaders =
    scala.collection.mutable.Map.empty[(SparkContext, Int), List[String]]

  private def logicalRddIds(df: DataFrame): Seq[(SparkContext, Int)] = {
    val sc = df.sparkSession.sparkContext
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => (sc, lr.rdd.id)
    }
  }

  /** Identity key for the lock map below: the cache itself is a MUTABLE
    * TrieMap whose content-based equals/hashCode change with every
    * insert, so keying locks by the map value would strand every
    * existing lock entry the moment the cache gains an entry (stale
    * unremovable growth) — and worse, two threads first-building the
    * same key could hash the tuple differently if the cache mutates
    * between their lookups, acquire DIFFERENT locks, and both build:
    * exactly the double-registerCached leak memo exists to close.
    * Reference identity is the only stable notion of "the same cache". */
  private final class IdKey(val ref: AnyRef) {
    override def hashCode: Int = System.identityHashCode(ref)
    override def equals(o: Any): Boolean = o match {
      case k: IdKey => k.ref eq ref
      case _        => false
    }
  }

  private val memoLocks =
    scala.collection.concurrent.TrieMap.empty[(IdKey, Any), Object]

  /** Atomic memo-cache insert: TrieMap.getOrElseUpdate does NOT
    * evaluate its builder atomically, so two threads racing on the
    * first build for the same key would BOTH build and
    * [[registerCached]] a frame — the loser's registration (and cache
    * buffer) then leaks because clearCaches only unregisters the stored
    * frame. The lock is PER (cache, key), not per cache map: some
    * builds run real Spark jobs (k-means training, the clustering
    * loop), and a map-wide lock would serialize unrelated keys behind
    * them. Lock objects are tiny and bounded by the number of distinct
    * keys ever built; every library memo cache inserts through this. */
  def memo[K, V](cache: scala.collection.concurrent.TrieMap[K, V],
      key: K, build: => V): V =
    cache.get(key).getOrElse {
      val candidate = new Object
      val lock = memoLocks.putIfAbsent((new IdKey(cache), key), candidate)
        .getOrElse(candidate)
      lock.synchronized {
        cache.get(key).getOrElse { val v = build; cache.put(key, v); v }
      }
    }

  /** Register a frame a cache is about to store/hand out. Returns the
    * frame for call-site convenience (`Ckpt.memo(cache, k,
    * Ckpt.registerCached(build, "Foo.barCache"))` — the build argument
    * is by-name, so registration still runs only on first build). */
  def registerCached(df: DataFrame, owner: String): DataFrame = {
    val ids = logicalRddIds(df)
    cachedReaders.synchronized {
      ids.foreach(id => cachedReaders.update(id, owner :: cachedReaders.getOrElse(id, Nil)))
    }
    df
  }

  /** Drop one registration per RDD id for the evicted frame. */
  def unregisterCached(df: DataFrame, owner: String): Unit = {
    val ids = logicalRddIds(df)
    cachedReaders.synchronized {
      ids.foreach { id =>
        cachedReaders.get(id).map(_.diff(List(owner))) match {
          case Some(Nil) | None => cachedReaders.remove(id)
          case Some(rest)       => cachedReaders.update(id, rest)
        }
      }
    }
  }

  /** Releases the checkpoint blocks captured by [[tracked]]. Idempotent;
    * releasing after the owning RDD was already cleaned is a no-op.
    * Throws if a registered cache entry still reads any of the handle's
    * RDDs — see [[registerCached]]. */
  final class Handle private[Ckpt] (sc: SparkContext, ids: Set[Int]) {
    def release(): Unit = {
      val clash = cachedReaders.synchronized {
        ids.toSeq.flatMap(id => cachedReaders.get((sc, id)).map(id -> _))
      }
      if (clash.nonEmpty)
        throw new IllegalStateException(
          "Ckpt.release would free unrecomputable localCheckpoint blocks " +
            s"still registered by cache entries: ${clash.mkString(", ")}. " +
            "Store recomputable .cache() frames in caches, or unregister " +
            "before release.")
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    }
  }

  private val noop = new Handle(null, Set.empty)

  /** Eagerly-materialized `localCheckpoint()` plus a handle that really
    * frees its blocks. The handle owns EXACTLY the checkpoint's backing
    * RDD (the `LogicalRDD` the returned Dataset wraps — the RDD that
    * `RDD.localCheckpoint()` persist-registered), never anything a
    * registration-window diff might sweep up (see the object scaladoc
    * for why the diff adopts live cache buffers). */
  def tracked(df: DataFrame): (DataFrame, Handle) = {
    val sc = df.sparkSession.sparkContext
    val out = df.localCheckpoint(eager = false)
    val ids = out.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    out.count()
    (out, new Handle(sc, ids))
  }

  /** A handle that releases nothing — the initial value for loop-state
    * handle vars whose first state is not checkpointed. */
  def empty: Handle = noop
}
