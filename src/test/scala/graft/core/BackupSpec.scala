package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Backup/restore parity: the LSM `Backup` contract (a point-in-time
  * snapshot exported to a portable directory) on the Spark engine —
  * consistency, independence from the source's later lifecycle, and
  * loud failure on incomplete backups.
  */
class BackupSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def freshDb(opts: GraftOptions = GraftOptions(compactTriggerFiles = 1000)): GraftDB =
    new GraftDB(spark, Files.createTempDirectory("graftdb-bk").toString, opts)

  private def visibleSet(db: GraftDB): Set[(String, String)] =
    db.entries().collect().map(e => (new String(e.key, "UTF-8"),
      new String(e.value, "UTF-8"))).toSet

  test("backup restores the exact visible set, blobs and tombstones included") {
    // small blob threshold so some values route through the value log
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, valueThreshold = 8))
    db.batchSet((0 until 40).map(i => KVEntry(b(f"k$i%03d"), b(s"v$i"))))
    db.batchSet((0 until 10).map(i => KVEntry(b(f"k$i%03d"), b("x" * 64)))) // blob overwrites
    db.del(b("k005"))
    db.del(b("k025"))
    val expected = visibleSet(db)
    val dest = Files.createTempDirectory("graft-backup").toString
    db.backupTo(dest)
    val restored = GraftDB.openBackup(spark, dest)
    assert(visibleSet(restored) == expected)
    // point reads resolve through the copied blob table too
    assert(restored.get(b("k003")).map(new String(_, "UTF-8")) == Some("x" * 64))
    assert(restored.get(b("k005")).isEmpty)
  }

  test("backup is independent: source mutations, compaction, and GC never touch it") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, valueThreshold = 8))
    db.batchSet((0 until 30).map(i => KVEntry(b(f"k$i%03d"), b(s"v$i"))))
    val dest = Files.createTempDirectory("graft-backup2").toString
    db.backupTo(dest)
    val frozen = visibleSet(GraftDB.openBackup(spark, dest))
    // mutate the source heavily AFTER the backup
    db.batchSet((0 until 30).map(i => KVEntry(b(f"k$i%03d"), b(s"CHANGED$i"))))
    (0 until 15).foreach(i => db.del(b(f"k$i%03d")))
    db.compact(); db.gcBlobs(); db.vacuum()
    val restored = GraftDB.openBackup(spark, dest)
    assert(visibleSet(restored) == frozen, "backup drifted with the source")
    // and the backup is writable as its own engine without touching the source
    restored.set(b("only-in-backup"), b("yes"))
    assert(restored.get(b("only-in-backup")).isDefined)
    assert(db.get(b("only-in-backup")).isEmpty)
  }

  test("backup refuses a dir that already holds an engine; openBackup fails loudly without one") {
    val db = freshDb()
    db.set(b("k"), b("v"))
    val dest = Files.createTempDirectory("graft-backup3").toString
    db.backupTo(dest)
    intercept[IllegalArgumentException] { db.backupTo(dest) }
    // a crashed backup = copied files but NO manifest: restore must fail,
    // never open as a silently-empty engine
    val torn = Files.createTempDirectory("graft-backup-torn").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$torn/data/deadbeef"))
    intercept[IllegalArgumentException] { GraftDB.openBackup(spark, torn) }
  }

  test("backup captures the pinned state even while later writes land mid-sequence") {
    val db = freshDb()
    db.batchSet((0 until 20).map(i => KVEntry(b(f"a$i%02d"), b("one"))))
    val dest = Files.createTempDirectory("graft-backup4").toString
    db.backupTo(dest)
    db.batchSet((0 until 20).map(i => KVEntry(b(f"a$i%02d"), b("two"))))
    val restored = GraftDB.openBackup(spark, dest)
    assert(visibleSet(restored).forall(_._2 == "one"),
      "backup leaked a post-snapshot write")
    // grid + counters survived the rebase: the restored engine keeps
    // compacting/writing correctly from where the snapshot stood
    restored.compact()
    assert(visibleSet(restored).forall(_._2 == "one"))
  }
}
