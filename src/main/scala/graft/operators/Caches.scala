package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic release for the engine's shared cached subtrees.
  *
  * Several operators cache an intermediate that later queries in the same
  * family reuse through CacheManager plan substitution (the tokenized
  * `termCounts` frame feeds n1–n5/n13/x61; the Duplicates TF and pair
  * frames feed n6/n7/n10/n11/p1) and deliberately never unpersist —
  * unpersisting at the call site would evict a subtree another consumer is
  * about to substitute (`Relevance.scala` documents the reasoning). The
  * cost of that policy is a long-lived session touching many corpora:
  * entries accumulate until LRU eviction, and the memory/GC pressure lands
  * on whatever runs late in the session.
  *
  * [[withScope]] bounds the lifetime without giving up sharing: every
  * [[shared]] cache registered while a scope is active (same thread — the
  * driver-side plan-construction thread) is unpersisted when the scope
  * exits, after the body has evaluated whatever it needed. Outside a
  * scope, [[shared]] is exactly `.cache()` — the cache-and-leave default
  * stands for interactive sessions, where the next query is unknown.
  */
object Caches {

  private val scopes =
    new ThreadLocal[java.util.ArrayDeque[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
      override def initialValue() =
        new java.util.ArrayDeque[scala.collection.mutable.ArrayBuffer[DataFrame]]()
    }

  /** Cache `df`; when a [[withScope]] is active on this thread, register
    * it for release at scope exit. Nested scopes release at the innermost
    * active scope (the registration point), matching who asked for it.
    */
  def shared(df: DataFrame): DataFrame = {
    df.cache()
    val stack = scopes.get()
    if (!stack.isEmpty) stack.peek() += df
    df
  }

  /** Run `body` (which must EVALUATE what it builds — write, collect,
    * count), then unpersist every [[shared]] frame registered inside.
    * Unpersist is idempotent and non-blocking; CacheManager drops the
    * entries immediately, block cleanup proceeds async.
    */
  def withScope[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer[DataFrame]()
    scopes.get().push(buf)
    try body
    finally {
      scopes.get().pop()
      buf.foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }
}
