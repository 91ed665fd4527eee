package graft.sources

/** Per-directory build-once latch shared by the artifact layouts
  * (round-10 verdict #4: a single global `built.synchronized` per layout
  * serialized first-touch builds of UNRELATED artifact dirs; the
  * sequential Verify gate never noticed, but two concurrent queries
  * first-touching two different artifacts would build one at a time).
  * One lock object per dir (`computeIfAbsent`), one memo set per layout:
  * different dirs build in parallel, the same dir builds exactly once
  * per JVM run.
  *
  * [[onceIfAbsent]] is the `ensure` path (skip when already built this
  * run); [[always]] is the unconditional `rebuild`/pricing path. Both
  * add to the memo only AFTER the build body succeeds, so a failed
  * build retries on the next touch instead of handing out a
  * missing/partial artifact. */
private[sources] final class BuildLatch {
  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(dir: String): Object =
    locks.computeIfAbsent(dir, _ => new Object)

  def onceIfAbsent(dir: String)(build: => Unit): Unit =
    lockFor(dir).synchronized {
      if (!built.contains(dir)) { build; built.add(dir); () }
    }

  def always(dir: String)(build: => Unit): Unit =
    lockFor(dir).synchronized { build; built.add(dir); () }
}
