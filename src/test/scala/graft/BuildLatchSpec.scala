package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** The per-dir build latch (round-10 verdict #4): first-touch builds of
  * DIFFERENT artifact dirs must run CONCURRENTLY (the old global
  * `built.synchronized` serialized them), while the same dir still builds
  * exactly once per JVM run and a failed build retries on the next
  * touch. Pure-JVM — the latch is threading logic, not Spark logic; the
  * spec lives in `graft.sources` to reach the package-private class. */
class BuildLatchSpec extends AnyFunSuite {

  test("different dirs build in parallel, same dir builds once") {
    val l = new BuildLatch
    val bothInside = new CountDownLatch(2) // reaches 0 only if builds OVERLAP
    val builds = new AtomicInteger(0)
    @volatile var overlapped = true
    val threads = Seq("dirA", "dirB").map { d =>
      new Thread(() => l.onceIfAbsent(d) {
        builds.incrementAndGet()
        bothInside.countDown()
        // block until the OTHER dir's build is also inside its body —
        // impossible under a global lock, trivially true per-dir
        if (!bothInside.await(10, TimeUnit.SECONDS)) overlapped = false
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(15000))
    assert(overlapped, "second dir's build never started while first was in progress")
    assert(builds.get() === 2)
    // same dirs again: memoized, zero new builds
    Seq("dirA", "dirB").foreach(d => l.onceIfAbsent(d) {
      builds.incrementAndGet()
    })
    assert(builds.get() === 2)
  }

  test("a failed build retries on the next touch; success memoizes") {
    val l = new BuildLatch
    val attempts = new AtomicInteger(0)
    intercept[RuntimeException] {
      l.onceIfAbsent("dirC") {
        attempts.incrementAndGet(); throw new RuntimeException("boom")
      }
    }
    l.onceIfAbsent("dirC") { attempts.incrementAndGet(); () } // retry builds
    l.onceIfAbsent("dirC") { attempts.incrementAndGet(); () } // now memoized
    assert(attempts.get() === 2)
    // the unconditional path still rebuilds under the same per-dir lock
    l.always("dirC") { attempts.incrementAndGet(); () }
    assert(attempts.get() === 3)
  }
}
