package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The cross-JVM artifact cache: a key hit serves without rebuilding
  * (what a SECOND JVM sees after the first one built), changed source
  * data or a version bump rebuilds under a new key, and stale keys are
  * swept. No SparkSession needed — the contract is pure layout. */
class ArtifactCacheSpec extends AnyFunSuite {

  private object base extends QueriesBase

  // a fake source table: fingerprint input only, never read
  private def newSource(): String = {
    val dir = Files.createTempDirectory("artifact_src").toString
    Files.write(Paths.get(dir, "documents.parquet"),
      "rows".getBytes("UTF-8"))
    dir
  }

  // each test uses a unique cache name so the shared default root
  // (java.io.tmpdir/graft_artifacts) stays isolated per run; the dirs
  // delete on JVM exit so spec runs don't accrete under the real root
  private def uniqueName(): String = {
    val name = s"spec-${java.util.UUID.randomUUID}"
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_artifacts", name)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      } catch { case _: Throwable => () }))
    name
  }

  private def fakeBuild(builds: java.util.concurrent.atomic.AtomicInteger)
                       (out: String): Unit = {
    builds.incrementAndGet()
    Files.createDirectories(Paths.get(out))
    Files.write(Paths.get(out, "_SUCCESS"), Array.emptyByteArray)
    Files.write(Paths.get(out, "part-0"), "data".getBytes("UTF-8"))
  }

  test("a key hit serves the existing artifact without rebuilding — the " +
    "second-JVM path") {
    val src = newSource()
    val name = uniqueName()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val p1 = base.diskCachedArtifact(name, 1, src, "documents")(fakeBuild(builds))
    // a fresh call (fresh JVM has no memo — this IS its first call)
    val p2 = base.diskCachedArtifact(name, 1, src, "documents")(fakeBuild(builds))
    assert(p1 === p2)
    assert(builds.get() === 1, "key hit must not rebuild")
    assert(Files.exists(Paths.get(p1, "_SUCCESS")))
  }

  test("changed source data rebuilds under a new key; the superseded key " +
    "survives ONE supersession cycle (a running JVM's memoized path) " +
    "and is swept by the cycle after") {
    val src = newSource()
    val name = uniqueName()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val p1 = base.diskCachedArtifact(name, 1, src, "documents")(fakeBuild(builds))
    // grow the source file (length is part of the fingerprint — mtime
    // granularity alone can be too coarse inside one test)
    Files.write(Paths.get(src, "documents.parquet"),
      "rows plus more rows".getBytes("UTF-8"))
    val p2 = base.diskCachedArtifact(name, 1, src, "documents")(fakeBuild(builds))
    assert(p1 !== p2, "changed data must produce a new cache key")
    assert(builds.get() === 2)
    assert(Files.exists(Paths.get(p1, "_SUCCESS")),
      "the newest superseded key must survive one cycle — another JVM " +
        "may still be serving it")
    // two fast builds can land in the same mtime millisecond; pin the
    // ordering the sweep's newest-survivor pick depends on
    assert(Paths.get(p1).toFile
      .setLastModified(System.currentTimeMillis() - 10000))
    val p3 = base.diskCachedArtifact(name, 2, src, "documents")(fakeBuild(builds))
    assert(p3 !== p2, "a version bump must produce a new cache key")
    assert(builds.get() === 3)
    assert(!Files.exists(Paths.get(p1)),
      "the twice-superseded key must be swept")
    assert(Files.exists(Paths.get(p2, "_SUCCESS")),
      "the once-superseded key keeps its grace cycle")
  }

  test("two source dirs coexist: a miss for one SF dir must not sweep " +
    "the other's live artifact (bench primary at sf0.1 + scaling pass " +
    "at sf0.01 share one JVM and one cache name)") {
    val srcA = newSource()
    val srcB = newSource()
    val name = uniqueName()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pA = base.diskCachedArtifact(name, 1, srcA, "documents")(fakeBuild(builds))
    val pB = base.diskCachedArtifact(name, 1, srcB, "documents")(fakeBuild(builds))
    assert(pA !== pB)
    assert(Files.exists(Paths.get(pA, "_SUCCESS")),
      "dir B's build swept dir A's live artifact")
    // and A still serves as a hit — the memoized path stays valid
    assert(base.diskCachedArtifact(name, 1, srcA, "documents")(fakeBuild(builds)) === pA)
    assert(builds.get() === 2)
  }

  test("a torn build (no _SUCCESS) is never served") {
    val src = newSource()
    val name = uniqueName()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    // first build TEARS: directory lands but _SUCCESS is missing
    val p1 = base.diskCachedArtifact(name, 1, src, "documents") { out =>
      builds.incrementAndGet()
      Files.createDirectories(Paths.get(out))
      Files.write(Paths.get(out, "part-0"), "torn".getBytes("UTF-8"))
    }
    assert(!Files.exists(Paths.get(p1, "_SUCCESS")))
    // the next call must rebuild (and this one commits)
    val p2 = base.diskCachedArtifact(name, 1, src, "documents")(fakeBuild(builds))
    assert(builds.get() === 2, "torn artifact served as a cache hit")
    assert(Files.exists(Paths.get(p2, "_SUCCESS")))
  }

  test("the stale-key sweep spares a concurrent builder's FRESH staging " +
    "dir (two JVMs cold-missing the same key) but reclaims hour-old " +
    "crash leftovers") {
    val src = newSource()
    val name = uniqueName()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    // seed the parent with two dot-staging dirs before any build: one
    // fresh (another JVM mid-write) and one old (a crashed build)
    val p1 = base.diskCachedArtifact(name, 1, src, "documents")(fakeBuild(builds))
    val parent = Paths.get(p1).getParent
    val fresh = parent.resolve(".build-concurrent-fresh")
    val stale = parent.resolve(".build-crashed-old")
    Files.createDirectories(fresh)
    Files.write(fresh.resolve("part-0"), "inflight".getBytes("UTF-8"))
    Files.createDirectories(stale)
    val twoHoursAgo = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    assert(stale.toFile.setLastModified(twoHoursAgo))
    // force a miss (new version key) so the sweep runs
    base.diskCachedArtifact(name, 2, src, "documents")(fakeBuild(builds))
    assert(Files.exists(fresh.resolve("part-0")),
      "sweep deleted a concurrent builder's in-flight staging dir")
    assert(!Files.exists(stale),
      "hour-old crash leftover staging dir not reclaimed")
  }

  test("the staging grace keys on the NEWEST mtime found recursively " +
    "(ADVICE r17): a long build whose writes land in a SUBDIRECTORY — a " +
    "Spark job committing part files under _temporary — keeps its " +
    "staging dir alive even when the top-level mtime is hours old") {
    val src = newSource()
    val name = uniqueName()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val p1 = base.diskCachedArtifact(name, 1, src, "documents")(fakeBuild(builds))
    val parent = Paths.get(p1).getParent
    val longBuild = parent.resolve(".build-long-running")
    val sub = longBuild.resolve("_temporary").resolve("0")
    Files.createDirectories(sub)
    Files.write(sub.resolve("part-0"), "fresh write".getBytes("UTF-8"))
    // age the top dir (and the intermediate) WAY past the grace window;
    // only the leaf part file is fresh — exactly what a long Spark write
    // looks like from outside
    val twoHoursAgo = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    assert(longBuild.toFile.setLastModified(twoHoursAgo))
    assert(longBuild.resolve("_temporary").toFile.setLastModified(twoHoursAgo))
    assert(sub.toFile.setLastModified(twoHoursAgo))
    base.diskCachedArtifact(name, 2, src, "documents")(fakeBuild(builds))
    assert(Files.exists(sub.resolve("part-0")),
      "sweep tore a live build whose only fresh mtime was a leaf file")
    // and once the LEAF ages out too, the dir is a genuine crash
    // leftover and is reclaimed
    assert(sub.resolve("part-0").toFile.setLastModified(twoHoursAgo))
    base.diskCachedArtifact(name, 3, src, "documents")(fakeBuild(builds))
    assert(!Files.exists(longBuild),
      "fully-aged staging dir not reclaimed")
  }
}
