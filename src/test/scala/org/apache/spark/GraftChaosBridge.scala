package org.apache.spark

/** Test-only bridge into the spark-private block-manager surface (the
  * same package trick as sql.GraftColumnBridge): removes a persisted
  * RDD's blocks cluster-wide WITHOUT unregistering the persist — the
  * executor-loss shape. The storage level stays set, so later reads
  * recompute and may RE-persist, unlike `RDD.unpersist`, which is
  * terminal. BlockEvictionSpec drives both flavors against the
  * engine's pinned intermediates.
  */
object GraftChaosBridge {
  def removeRddBlocks(sc: SparkContext, rddId: Int): Unit =
    sc.env.blockManager.master.removeRdd(rddId, blocking = false)

  /** Broadcast ids with at least one live block on this (local-mode)
    * block manager — the observable behind the q17 broadcast-lifetime
    * gate: q17's verify broadcast is deliberately left to the
    * ContextCleaner, so its id must vanish from this set once the
    * result plan is unreachable and a GC has run.
    */
  def liveBroadcastIds(sc: SparkContext): Set[Long] =
    sc.env.blockManager.getMatchingBlockIds(_.isBroadcast).collect {
      case storage.BroadcastBlockId(id, _) => id
    }.toSet
}
