package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import graft.SparkSpec
import graft.operators.PartitionedLayout
import graft.sources.IncrementalDocArtifact.Piece
import graft.sources.WriterLease.ConcurrentWriterException

/** Cross-process single-writer ENFORCEMENT (round-12): a mutation of
  * an artifact or layout whose root carries a LIVE foreign lease is
  * refused with [[ConcurrentWriterException]] instead of silently
  * interleaving files; a STALE lease (crashed holder — heartbeat
  * stopped) is taken over atomically; read/serve paths never touch
  * the lease at all. "Foreign" is simulated by planting a lease file
  * this JVM never acquired — exactly what a second process's lease
  * looks like from here.
  */
class WriterLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def plantForeignLease(root: Path, ageMs: Long = 0L): Path = {
    Files.createDirectories(root)
    val lease = root.resolve(WriterLease.LeaseName)
    Files.writeString(lease, "99999-deadbeef")
    Files.setLastModifiedTime(lease,
      FileTime.fromMillis(System.currentTimeMillis() - ageMs))
    lease
  }

  private def staleAge: Long = WriterLease.staleMs + 5000L

  test("lease is reentrant within the JVM (across threads) and removed on outermost release") {
    val root = Files.createTempDirectory("graft-lease-unit")
    val lease = root.resolve(WriterLease.LeaseName)
    WriterLease.withLease(root, "outer") {
      Files.exists(lease) shouldBe true
      // a second hold from ANOTHER thread of this JVM — the ingest
      // tick / detached fold overlap — is one writer to the outside
      val t = new Thread(() => WriterLease.withLease(root, "inner") {
        Files.exists(lease) shouldBe true
      })
      t.start(); t.join()
      Files.exists(lease) shouldBe true // inner release kept the hold
    }
    Files.exists(lease) shouldBe false
  }

  test("the heartbeat keeps a long-held lease live (mtime refreshes while held)") {
    val root = Files.createTempDirectory("graft-lease-hb")
    WriterLease.withLease(root, "long mutation") {
      val lease = root.resolve(WriterLease.LeaseName)
      // simulate a missed refresh: age the file far past the stale
      // horizon; the daemon heartbeat (sub-second cadence) must bring
      // it back — this is what makes a live holder untakeable however
      // long its mutation runs
      Files.setLastModifiedTime(lease,
        FileTime.fromMillis(System.currentTimeMillis() - staleAge))
      val deadline = System.currentTimeMillis() + 10000
      var fresh = false
      while (!fresh && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        fresh = System.currentTimeMillis() -
          Files.getLastModifiedTime(lease).toMillis < WriterLease.staleMs
      }
      assert(fresh, "heartbeat never refreshed the held lease")
    }
  }

  test("a LIVE foreign lease refuses acquisition; a STALE one is taken over") {
    val root = Files.createTempDirectory("graft-lease-foreign")
    plantForeignLease(root)
    val e = intercept[ConcurrentWriterException] {
      WriterLease.withLease(root, "spec mutation") { fail("must not run") }
    }
    e.getMessage should include("99999-deadbeef")

    // crashed holder: mtime beyond the stale horizon → takeover
    plantForeignLease(root, ageMs = staleAge)
    var ran = false
    WriterLease.withLease(root, "spec mutation") { ran = true }
    ran shouldBe true
    Files.exists(root.resolve(WriterLease.LeaseName)) shouldBe false
  }

  test("a REAL second process's live lease refuses this JVM's mutation; its release frees it") {
    // the genuine two-process protocol, not a planted file: a spawned
    // JVM (graft.tools.LeaseHolderMain) acquires and heartbeats the
    // lease; this JVM's acquisition must refuse while it lives and
    // succeed after it releases. WriterLease is pure java.nio, so the
    // child needs only the compiled classes + scala-library.
    val root = Files.createTempDirectory("graft-lease-xproc")
    // derive java and the classpath from the RUNNING JVM — a PATH java
    // of another major version or a moved classes dir must not break
    // the test
    def loc(c: Class[_]): String =
      Paths.get(c.getProtectionDomain.getCodeSource.getLocation.toURI).toString
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
    val cp = Seq(loc(classOf[WriterLease.ConcurrentWriterException]),
      loc(classOf[scala.Option[_]])).mkString(java.io.File.pathSeparator)
    val pb = new ProcessBuilder(javaBin.toString, "-cp", cp,
      "graft.tools.LeaseHolderMain", root.toString, "6000")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    try {
      val first = out.readLine()
      withClue(s"holder said: $first: ")(first shouldBe "HELD")
      val e = intercept[ConcurrentWriterException] {
        WriterLease.withLease(root, "cross-process contender") {
          fail("must not run while the other process holds")
        }
      }
      e.getMessage should include("another process")
      // after the holder releases and exits, acquisition succeeds
      proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
      var ran = false
      WriterLease.withLease(root, "post-release") { ran = true }
      ran shouldBe true
    } finally {
      proc.destroyForcibly()
      out.close()
    }
  }

  test("artifact mutations refuse under a live foreign lease; serves of an unchanged artifact never touch it") {
    val sf = Files.createTempDirectory("graft-lease-art").toString
    val corpus = s"$sf/documents.parquet"
    Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(corpus)
    def handle = IncrementalDocArtifact(corpus, "lspec",
      Seq(Piece("rows", (docs, _) => docs)), compactEvery = 0)
    handle.serve(spark, "rows").count() shouldBe 2

    val root = Paths.get(ArtifactStore.root,
      ArtifactStore.pathKey(corpus) + "_lspec")
    plantForeignLease(root)
    // unchanged corpus → pure read: no lease check, serve proceeds
    handle.serve(spark, "rows").count() shouldBe 2

    // corpus append → the advance is a mutation → refused
    Seq((3L, "three")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(corpus)
    intercept[ConcurrentWriterException] { handle.serve(spark, "rows") }
    // explicit rebuild and fold refuse too
    intercept[ConcurrentWriterException] { handle.rebuild(spark) }
    intercept[ConcurrentWriterException] { handle.compact(spark) }

    // holder crashed (stale) → takeover, advance lands, lease cleaned
    plantForeignLease(root, ageMs = staleAge)
    handle.serve(spark, "rows").count() shouldBe 3
    Files.exists(root.resolve(WriterLease.LeaseName)) shouldBe false
  }

  test("a staleness horizon below 4 heartbeats refuses acquisition loudly (no silent two-writer config)") {
    // a horizon shorter than a few heartbeat intervals lets a LIVE
    // holder's lease look stale between refreshes and be stolen —
    // the engine must refuse the configuration, not honor it
    val root = Files.createTempDirectory("graft-lease-horizon")
    System.setProperty("graft.lease.staleMs", "1000") // < 4 × 750 ms
    try {
      val e = intercept[IllegalArgumentException] {
        WriterLease.withLease(root, "misconfigured mutation") {
          fail("must not run under an unsafe horizon")
        }
      }
      e.getMessage should include("graft.lease.staleMs")
      e.getMessage should include("two writers")
      // nothing acquired: no lease file, and a corrected horizon works
      Files.exists(root.resolve(WriterLease.LeaseName)) shouldBe false
    } finally System.clearProperty("graft.lease.staleMs")
    var ran = false
    WriterLease.withLease(root, "default horizon") { ran = true }
    ran shouldBe true
  }

  test("layout mutations refuse under a live foreign lease; the fresh-manifest serve path does not") {
    val src = Files.createTempDirectory("graft-lease-layout")
      .resolve("src.parquet").toString
    (1L to 40L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.parquet(src)
    val tableRoot = Paths.get(s"${ArtifactStore.root}/partitioned/lspec_layout")

    // first build IS a mutation → refused under a live foreign lease
    plantForeignLease(tableRoot)
    intercept[ConcurrentWriterException] {
      PartitionedLayout.ensureIncremental(spark, src, "lspec_layout", "pk",
        identity)
    }

    // stale → takeover, layout builds
    plantForeignLease(tableRoot, ageMs = staleAge)
    PartitionedLayout.ensureIncremental(spark, src, "lspec_layout", "pk",
      identity)
    PartitionedLayout.read(spark, "lspec_layout").count() shouldBe 40

    // unchanged ledger → serve path, lease never consulted
    plantForeignLease(tableRoot)
    PartitionedLayout.ensureIncremental(spark, src, "lspec_layout", "pk",
      identity)
    PartitionedLayout.read(spark, "lspec_layout").count() shouldBe 40

    // but an append under the live foreign lease is refused
    (41L to 50L).map(i => (i % 4, i)).toDF("pk", "id")
      .coalesce(1).write.mode("append").parquet(src)
    intercept[ConcurrentWriterException] {
      PartitionedLayout.ensureIncremental(spark, src, "lspec_layout", "pk",
        identity)
    }
    Files.deleteIfExists(tableRoot.resolve(WriterLease.LeaseName))
  }
}
