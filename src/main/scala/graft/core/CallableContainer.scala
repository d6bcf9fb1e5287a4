package graft.core

import scala.collection.mutable.ArrayBuffer

/** First-match dispatch registry — the plan-time analog of the
  * reference's `CallableContainer` (`puffbird/callables.py:12-55`), which
  * dispatches per-cell handlers by `isinstance` at runtime. On Spark the
  * dispatch key is the static `DataType` (or any predicate `K => Boolean`)
  * and the dispatch happens once while building the plan, not per row.
  *
  * Like the reference (`callables.py:36-52`), [[add]] appends and
  * dispatch takes the FIRST registered predicate that accepts the key —
  * on overlapping predicates the earlier registration wins.
  */
final class CallableContainer[K, V] {
  private val handlers = ArrayBuffer.empty[(K => Boolean, V)]

  def add(pred: K => Boolean, value: V): this.type = {
    handlers.append((pred, value))
    this
  }

  def get(key: K): Option[V] =
    handlers.collectFirst { case (p, v) if p(key) => v }

  def apply(key: K): V =
    get(key).getOrElse(
      throw new PuffbirdException(s"no handler registered for $key"))
}
