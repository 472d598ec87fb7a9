package graft.core

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.scalatest.funsuite.AnyFunSuite

class ManifestSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-manifest").toString

  private def meta(i: Int, level: Int = 0): FileMeta =
    FileMeta(s"data/seg-$i/part-0.parquet", level, f"$i%08x", f"$i%08x" + "ff", 100L, i.toLong)

  private def addFile(m: Manifest, i: Int): Unit =
    m.commit(st => ManifestDelta(nextVersion = Some(st.nextVersion + 1),
      addFiles = Vector(meta(i))))

  test("commit cost is O(changed files), not O(all files)") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 1000000) // never compact in this test
    val log = Paths.get(dir, "MANIFEST.log")
    addFile(m, 0)
    val afterFirst = Files.size(log)
    (1 until 500).foreach(addFile(m, _))
    val before = Files.size(log)
    addFile(m, 500)
    val delta = Files.size(log) - before
    // one 1-file commit appends about as many bytes with 500 live files as
    // with 1 — the old whole-state rewrite would scale delta with the table
    assert(delta <= 2 * afterFirst,
      s"1-file commit appended $delta bytes at 500 files vs $afterFirst at 1 — commit cost scales with table size")
    assert(m.load().files.size == 501)
  }

  test("commit CPU is O(touched files): 1-file commits stay fast on a large table") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 1000000)
    def timeCommits(ids: Range): Double = {
      val t0 = System.nanoTime()
      ids.foreach(addFile(m, _))
      (System.nanoTime() - t0) / 1e6 / ids.size
    }
    // each side is the BEST of three windows: this asserts a CPU
    // complexity bound on a shared box whose load whipsaws bench numbers
    // 4-5x — one co-tenant spike or GC pause inside a single window must
    // not fail it, and min (unlike mean) discards the spiked windows
    def bestOf3(windows: Seq[Range]): Double = windows.map(timeCommits).min
    timeCommits(0 until 300) // JIT + page-cache warmup, not measured
    val smallPer = bestOf3(Seq(300 until 400, 400 until 500, 500 until 600)) // ~500-file table
    // grow to ~20k live files in a few bulk deltas
    (0 until 10).foreach { k =>
      m.commit(_ => ManifestDelta(
        addFiles = (0 until 2000).map(j => meta(1000000 + k * 2000 + j)).toVector))
    }
    val bigPer = bestOf3(Seq(600 until 700, 700 until 800, 800 until 900))
    // a whole-state set-diff per commit costs O(20k) hash/equality ops here
    // and fails this by an order of magnitude; O(delta) commits are flat
    // (8x + 1ms absolute slack absorbs fs/GC noise, not a linear scan)
    assert(bigPer < smallPer * 8 + 1.0,
      f"1-file commit took $bigPer%.3f ms/commit at ~20k files vs $smallPer%.3f at ~500")
    assert(m.load().files.size == 20900)
  }

  test("two writer instances on one dir interleave commits without lost updates") {
    val dir = tmpDir()
    val a = new Manifest(dir, logCompactEvery = 1000)
    val b = new Manifest(dir, logCompactEvery = 1000)
    // alternating: each instance must observe the other's commit (stamp
    // revalidation) and chain its seq after it — a lost update or a
    // double-assigned seq breaks the replay chain loudly
    (0 until 10).foreach(i => addFile(if (i % 2 == 0) a else b, i))
    assert(a.load().files.size == 10 && b.load().files.size == 10)
    assert(a.load().commitSeq == 10L)
    // concurrent from two threads, one per instance: the per-rootDir
    // monitor (shared — per-instance locks would interleave truncation
    // and append) plus the MANIFEST.lock file ring serialize them
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fa = Future((100 until 150).foreach(addFile(a, _)))
    val fb = Future((200 until 250).foreach(addFile(b, _)))
    Await.result(Future.sequence(Seq(fa, fb)), 60.seconds)
    val st = a.load()
    assert(st.files.size == 110 && st.commitSeq == 110L,
      s"lost update across instances: ${st.files.size} files, seq ${st.commitSeq}")
    // a cold replay agrees — and the advisory writer lock file exists
    assert(new Manifest(dir).load() == st)
    assert(Files.exists(Paths.get(dir, "MANIFEST.lock")))
  }

  test("cross-PROCESS writers and readers: two foreign JVMs + this one interleave safely") {
    val dir = tmpDir()
    // two REAL foreign JVMs hammer commits (fold threshold 16, so snapshot
    // folds + log restarts happen while others are mid-flight) while this
    // JVM commits AND cold-reads concurrently. The file-lock ring must
    // serialize the writers (no lost update, no double-assigned seq) and
    // the readers' SHARED lock must never observe a foreign commit+fold as
    // a phantom seq gap or a state missing folded records.
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def spawn(tag: String): Process =
      new ProcessBuilder(javaBin, "-cp", cp, "graft.core.ManifestHammer", dir, tag, "60")
        .redirectErrorStream(true).start()
    val p1 = spawn("p1")
    val p2 = spawn("p2")
    val local = new Manifest(dir, logCompactEvery = 16)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val committer = Future((0 until 60).foreach { i =>
      local.commit(st => ManifestDelta(
        nextVersion = Some(st.nextVersion + 1),
        addFiles = Vector(FileMeta(s"data/h-local-$i", 0, "00", "ff", 1L, st.nextVersion))))
    })
    // a dedicated READER instance with its own cache: every load is a
    // stamp-miss against fresh foreign commits, so it cold-loads often
    val reader = new Manifest(dir, logCompactEvery = 16)
    val reads = Future {
      var last = 0L
      while (!committer.isCompleted || p1.isAlive || p2.isAlive) {
        val st = reader.load() // throws on gap/corruption = test failure
        assert(st.commitSeq >= last, s"manifest went backwards: $last -> ${st.commitSeq}")
        last = st.commitSeq
      }
    }
    assert(p1.waitFor(120, java.util.concurrent.TimeUnit.SECONDS) && p1.exitValue() == 0,
      s"hammer p1 failed: ${new String(p1.getInputStream.readAllBytes())}")
    assert(p2.waitFor(120, java.util.concurrent.TimeUnit.SECONDS) && p2.exitValue() == 0,
      s"hammer p2 failed: ${new String(p2.getInputStream.readAllBytes())}")
    Await.result(committer, 120.seconds)
    Await.result(reads, 120.seconds)
    val st = local.load()
    assert(st.files.size == 180 && st.commitSeq == 180L,
      s"lost update across processes: ${st.files.size} files, seq ${st.commitSeq}")
    assert(new Manifest(dir).load() == st) // cold replay agrees
  }

  test("aliased spellings of one dir share the commit monitor (symlink-safe)") {
    val dir = tmpDir()
    val link = dir + "-link"
    Files.createSymbolicLink(Paths.get(link), Paths.get(dir))
    // lexical normalization would hand these different monitors; both
    // threads would then reach the same MANIFEST.lock inode in one JVM
    // and the second would die with OverlappingFileLockException
    assert(Manifest.lockFor(dir) eq Manifest.lockFor(link))
    val a = new Manifest(dir, logCompactEvery = 1000)
    val b = new Manifest(link, logCompactEvery = 1000)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fa = Future((0 until 30).foreach(addFile(a, _)))
    val fb = Future((100 until 130).foreach(addFile(b, _)))
    Await.result(Future.sequence(Seq(fa, fb)), 60.seconds)
    assert(a.load().files.size == 60 && a.load().commitSeq == 60L)
  }

  test("log compacts into the snapshot past the threshold and restarts empty") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 10)
    (0 until 25).foreach(addFile(m, _))
    // 25 commits, threshold 10: at least two compactions happened; the log
    // holds the post-compaction tail only
    val logLines =
      if (Files.exists(Paths.get(dir, "MANIFEST.log")))
        Files.readString(Paths.get(dir, "MANIFEST.log")).count(_ == '\n')
      else 0
    assert(logLines < 10, s"log holds $logLines records past threshold 10")
    val st = m.load()
    assert(st.files.size == 25 && st.commitSeq == 25L)
    // a fresh instance replays snapshot + tail to the same state
    assert(new Manifest(dir).load() == st)
  }

  test("stateless reopen replays base + log to the committed state") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 1000)
    (0 until 7).foreach(addFile(m, _))
    m.commit(_ => ManifestDelta(removePaths = Vector(meta(3).path)))
    m.commit(_ => ManifestDelta(addBounds = Vector("aa", "cc")))
    m.commit(_ => ManifestDelta(addBounds = Vector("bb"))) // refine delta
    m.commit(_ => ManifestDelta(addBlobs = Vector(BlobFileMeta("blobs/b0", 5L))))
    val want = m.load()
    val got = new Manifest(dir).load()
    assert(got == want)
    assert(got.files.size == 6 && got.rangeBoundsHex == Vector("aa", "bb", "cc"))
  }

  test("a second instance on the same dir observes foreign commits") {
    val dir = tmpDir()
    val a = new Manifest(dir)
    val b = new Manifest(dir)
    addFile(a, 0)
    assert(b.load().files.size == 1, "instance b served a stale cache")
    addFile(b, 1)
    assert(a.load().files.size == 2, "instance a served a stale cache")
  }

  test("torn final record (crashed append) is dropped; earlier corruption fails loudly") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 1000)
    (0 until 3).foreach(addFile(m, _))
    val log = Paths.get(dir, "MANIFEST.log")
    // simulate a crash mid-append: partial JSON, no trailing newline
    Files.write(log, """{"seq":4,"nextVersion":99,"addFi""".getBytes,
      StandardOpenOption.APPEND)
    val st = new Manifest(dir).load()
    assert(st.files.size == 3 && st.commitSeq == 3L, "torn tail must be dropped, not applied")
    // the WRITER truncates the torn bytes before its next append — the new
    // record must not merge with the torn prefix into one unparsable line
    val m2 = new Manifest(dir, logCompactEvery = 1000)
    addFile(m2, 3)
    val recovered = new Manifest(dir).load()
    assert(recovered.files.size == 4 && recovered.commitSeq == 4L,
      "append after a torn tail corrupted the log")
    // a PARSEABLE but unterminated final record is still an unacknowledged
    // crash (the '\n' never made it): dropped, and the next commit's
    // truncation must not leave a seq gap
    val m3 = new Manifest(dir, logCompactEvery = 1000)
    val st4 = m3.load()
    val ghost = """{"seq":5,"nextVersion":99,"nextBlobId":1,"addFiles":[],"removePaths":[],""" +
      """"addBlobs":[],"removeBlobPaths":[],"clearBounds":false,"addBounds":[],"removeBounds":[]}"""
    Files.write(log, ghost.getBytes, StandardOpenOption.APPEND) // no newline
    assert(new Manifest(dir).load() == st4, "unterminated record must not be applied")
    addFile(m3, 4)
    val st5 = new Manifest(dir).load()
    assert(st5.files.size == 5 && st5.commitSeq == 5L && st5.nextVersion != 99L,
      "truncate-then-append after a parseable torn tail broke the replay chain")
    // a corrupt but NEWLINE-TERMINATED record was an acknowledged commit —
    // real corruption, fails loudly wherever it sits (including the end)
    Files.write(log, "{garbage}\n".getBytes, StandardOpenOption.APPEND)
    assertThrows[IllegalStateException](new Manifest(dir).load())
    // corruption in the MIDDLE likewise throws
    val lines = Files.readString(log).split("\n").toVector
    val mangled = (lines.take(1) :+ "{garbage}") ++ lines.drop(2)
    Files.write(log, (mangled.mkString("\n") + "\n").getBytes)
    assertThrows[IllegalStateException](new Manifest(dir).load())
  }

  test("stale records below the snapshot seq are skipped (crash between snapshot and truncate)") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 5)
    (0 until 5).foreach(addFile(m, _)) // exactly at threshold: compacted, log gone
    assert(!Files.exists(Paths.get(dir, "MANIFEST.log")))
    // resurrect a stale pre-compaction record, as a crash-before-delete would
    Files.write(Paths.get(dir, "MANIFEST.log"),
      ("""{"seq":1,"nextVersion":2,"nextBlobId":1,"addFiles":[{"path":"data/ghost","level":0,""" +
        """"minKeyHex":"00","maxKeyHex":"ff","rows":1,"createdVersion":1}],"removePaths":[],""" +
        """"addBlobs":[],"removeBlobPaths":[],"clearBounds":false,"addBounds":[],"removeBounds":[]}""" + "\n").getBytes)
    val st = new Manifest(dir).load()
    assert(st.files.size == 5 && !st.files.exists(_.path == "data/ghost"),
      "stale record was replayed over the newer snapshot")
  }

  test("no-op transforms commit nothing") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 1000)
    addFile(m, 0)
    val log = Paths.get(dir, "MANIFEST.log")
    val before = Files.size(log)
    val seqBefore = m.load().commitSeq
    m.commit(_ => ManifestDelta.empty)
    assert(Files.size(log) == before && m.load().commitSeq == seqBefore)
  }

  test("concurrent committers serialize: all commits land, seq stays contiguous") {
    val dir = tmpDir()
    val m = new Manifest(dir, logCompactEvery = 25) // compactions happen mid-race
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val futures = (0 until 8).map { w =>
      Future {
        (0 until 20).foreach { i =>
          m.commit(st => ManifestDelta(nextVersion = Some(st.nextVersion + 1),
            addFiles = Vector(meta(w * 1000 + i))))
        }
      }
    }
    Await.result(Future.sequence(futures), 60.seconds)
    val st = m.load()
    assert(st.files.size == 160 && st.commitSeq == 160L && st.nextVersion == 161L)
    // a cold replay (snapshot + post-compaction tail) reproduces it exactly
    assert(new Manifest(dir).load() == st)
  }

  test("pre-changelog manifests (whole-state JSON, no log) still load") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "MANIFEST.json"),
      """{"nextVersion":7,"nextBlobId":3,"files":[{"path":"data/x","level":1,""" +
        """"minKeyHex":"00","maxKeyHex":"ff","rows":42,"createdVersion":5}],"blobFiles":[]}""")
    val st = new Manifest(dir).load()
    assert(st.nextVersion == 7L && st.files.head.rows == 42L && st.commitSeq == 0L)
    // and the first post-upgrade commit appends a v2 change record cleanly
    val m = new Manifest(dir)
    m.commit(s => ManifestDelta(nextVersion = Some(s.nextVersion + 1)))
    assert(new Manifest(dir).load().nextVersion == 8L)
  }
}
