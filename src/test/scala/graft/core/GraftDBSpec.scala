package graft.core

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // bucketed saveAsTable (BucketingSpec) needs a writable warehouse
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}

/** Parity tests mirroring the reference's API round-trip suite
  * (`kv/db_test.go`, `kv/vlog_test.go`) on the Spark engine.
  */
class GraftDBSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def freshDb(opts: GraftOptions = GraftOptions(compactTriggerFiles = 1000)): GraftDB = {
    val dir = Files.createTempDirectory("graftdb").toString
    new GraftDB(spark, dir, opts)
  }
  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")
  // special-char corpus like the reference's rand keys (kv/utils/rand.go:15-25)
  private val charset = "0123456789abcdefXYZ~=+%^*/()[]{}/!@#$?"
  private def randKey(rnd: scala.util.Random): Array[Byte] =
    (Array.fill(8)(charset(rnd.nextInt(charset.length))) ++ "12345678").map(_.toByte)

  test("set/get round-trip, 64 random entries (kv/db_test.go:36-49)") {
    val db = freshDb()
    val rnd = new scala.util.Random(42)
    val entries = (0 until 64).map(i => (randKey(rnd), b(s"value-$i")))
    db.batchSet(entries.map { case (k, v) => KVEntry(k, v) })
    // last writer wins among duplicate random keys within the batch
    val expected = entries.foldLeft(Map.empty[Seq[Byte], Array[Byte]]) {
      case (m, (k, v)) => m + (k.toSeq -> v)
    }
    expected.foreach { case (k, v) =>
      assert(db.get(k.toArray).map(_.toSeq).contains(v.toSeq))
    }
    assert(db.get(b("missing-key")).isEmpty)
  }

  test("delete hides key; re-insert resurrects (kv/db_test.go:59-105)") {
    val db = freshDb()
    db.set(b("k1"), b("v1"))
    assert(db.get(b("k1")).map(new String(_)).contains("v1"))
    db.del(b("k1"))
    assert(db.get(b("k1")).isEmpty)
    db.set(b("k1"), b("v2"))
    assert(db.get(b("k1")).map(new String(_)).contains("v2"))
  }

  test("TTL: expired invisible; newer expired version shadows older live one") {
    val db = freshDb()
    db.set(b("ttl1"), b("x"), ttlSeconds = -100) // already expired
    assert(db.get(b("ttl1")).isEmpty)
    // newer expired shadows older live (SURVEY §7.4: TTL filtered AFTER LWW)
    db.set(b("ttl2"), b("live"))
    db.set(b("ttl2"), b("dead"), ttlSeconds = -100)
    assert(db.get(b("ttl2")).isEmpty)
    db.set(b("ttl3"), b("y"), ttlSeconds = 10000)
    assert(db.get(b("ttl3")).map(new String(_)).contains("y"))
  }

  test("blob routing: large values round-trip via blob table (kv/vlog_test.go:25-94)") {
    val db = freshDb(GraftOptions(valueThreshold = 32, compactTriggerFiles = 1000))
    val big = Array.fill[Byte](1000)(7)
    db.set(b("big"), big)
    db.set(b("small"), b("s"))
    assert(db.get(b("big")).map(_.toSeq).contains(big.toSeq))
    assert(db.get(b("small")).map(new String(_)).contains("s"))
    // view resolves blob values too
    val rows = db.view().collect().map(r =>
      new String(r.getAs[Array[Byte]]("key")) -> r.getAs[Array[Byte]]("value").length).toMap
    assert(rows("big") == 1000 && rows("small") == 1)
  }

  test("scan: ordered, range, prefix, desc — binary-safe") {
    val db = freshDb()
    val keys = Seq("a", "ab", "abc", "b", "ba", "z~!", "z~#")
    db.batchSet(keys.map(k => KVEntry(b(k), b(s"v-$k"))))
    val asc = db.scan().collect().map(r => new String(r.getAs[Array[Byte]]("key")))
    assert(asc.toSeq == keys.sorted)
    val desc = db.scan(ascending = false).collect().map(r => new String(r.getAs[Array[Byte]]("key")))
    assert(desc.toSeq == keys.sorted.reverse)
    val pre = db.scan(prefix = Some(b("ab"))).collect().map(r => new String(r.getAs[Array[Byte]]("key")))
    assert(pre.toSeq == Seq("ab", "abc"))
    val rng = db.scan(from = Some(b("ab")), until = Some(b("ba")))
      .collect().map(r => new String(r.getAs[Array[Byte]]("key")))
    assert(rng.toSeq == Seq("ab", "abc", "b"))
  }

  test("prefixSuccessor: carry and all-0xff") {
    assert(GraftDB.prefixSuccessor(Array[Byte](1, 2)).get.toSeq == Seq[Byte](1, 3))
    assert(GraftDB.prefixSuccessor(Array(1.toByte, 0xff.toByte)).get.toSeq == Seq[Byte](2))
    assert(GraftDB.prefixSuccessor(Array(0xff.toByte, 0xff.toByte)).isEmpty)
  }

  test("iterator seek: first key >= target ascending, <= target descending (kv/iterator.go:78-79 stub, implemented)") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000))
    db.batchSet(Seq("a", "c", "e", "g").map(k => KVEntry(b(k), b(s"v$k"))))
    def keys(it: Iterator[org.apache.spark.sql.Row]) =
      it.map(r => new String(r.getAs[Array[Byte]]("key"))).toList
    assert(keys(db.iterator(seek = Some(b("c")))) == List("c", "e", "g"))
    assert(keys(db.iterator(seek = Some(b("d")))) == List("e", "g")) // between keys
    assert(keys(db.iterator(ascending = false, seek = Some(b("d")))) == List("c", "a"))
    assert(keys(db.iterator(ascending = false, seek = Some(b("e")))) == List("e", "c", "a"))
    assert(keys(db.iterator(seek = Some(b("z")))) == Nil)
  }

  test("snapshot: frozen reads survive compaction+vacuum until closed (vlog_gc.go:364-390 refcounts)") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000))
    db.batchSet((0 until 30).map(i => KVEntry(b(f"s$i%03d"), b(s"old$i"))))
    val snap = db.snapshot()
    // the world moves on: overwrites, a delete, compaction, vacuum
    db.batchSet((0 until 30).map(i => KVEntry(b(f"s$i%03d"), b(s"new$i"))))
    db.del(b("s000"))
    db.compact()
    db.vacuum() // must NOT reclaim the snapshot's pinned segments
    val now = db.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value"))).toMap
    assert(now.size == 29 && now("s001") == "new1")
    val frozen = snap.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value"))).toMap
    assert(frozen.size == 30 && frozen("s000") == "old0" && frozen("s001") == "old1",
      s"snapshot saw later writes: $frozen")
    // close releases the pin; the next vacuum reclaims the old generation
    val dataDir = new java.io.File(s"${db.rootDir}/data")
    val before = dataDir.listFiles().length
    snap.close()
    db.vacuum()
    assert(dataDir.listFiles().length < before, "vacuum reclaimed nothing after the pin was released")
    assert(db.view().count() == 29)
  }

  test("compaction preserves the merge-on-read view and drops dead entries") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000))
    (0 until 5).foreach { gen =>
      db.batchSet((0 until 20).map(i => KVEntry(b(f"key$i%03d"), b(s"g$gen-$i"))))
    }
    db.del(b("key000")); db.del(b("key001"))
    db.set(b("exp"), b("x"), ttlSeconds = -10)
    val before = db.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value")))
      .toMap
    assert(before.size == 18 && before("key005") == "g4-5")
    db.compact()
    val after = db.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value")))
      .toMap
    assert(after == before)
    assert(db.stats()("level0Segments") == 0)
    // raw log after compaction holds no tombstones/expired rows
    assert(db.rawLog().filter("tombstone OR (expiresAt != 0 AND expiresAt < unix_timestamp())").count() == 0)
    db.vacuum()
    assert(after == db.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value"))).toMap)
  }

  test("leveled compaction: non-overlapping level-1 files are not rewritten") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, rangePartitions = 4))
    // build a compacted level-1 range over keys a*
    db.batchSet((0 until 40).map(i => KVEntry(b(f"a$i%03d"), b(s"v$i"))))
    db.compact()
    val l1Paths = { val s = db.stats(); assert(s("level0Segments") == 0); dbFiles(db) }
    // new L0 in a DISJOINT key range z* -> minor compact must keep a* files
    db.batchSet((0 until 10).map(i => KVEntry(b(f"z$i%03d"), b(s"w$i"))))
    db.compact()
    val after = dbFiles(db)
    assert(l1Paths.subsetOf(after), "disjoint level-1 files were rewritten")
    assert(db.view().count() == 50)
    // overlapping write DOES rewrite the touched range
    db.batchSet(Seq(KVEntry(b("a005"), b("updated"))))
    db.compact()
    assert(db.get(b("a005")).map(new String(_)).contains("updated"))
    assert(db.stats()("level0Segments") == 0)
  }

  private def dbFiles(db: GraftDB): Set[String] =
    db.rawLog().select(org.apache.spark.sql.functions.input_file_name())
      .distinct().collect().map(_.getString(0)).toSet

  test("vlog fixture: valueThreshold=0 routes every value to the blob table (kv/vlog_test.go:25-94)") {
    val db = freshDb(GraftOptions(valueThreshold = 0, compactTriggerFiles = 1000))
    val v1 = Array.fill[Byte](33)(1)
    val v2 = Array.fill[Byte](34)(2)
    db.set(b("samplekey"), v1)
    db.set(b("samplekeyb"), v2)
    assert(db.get(b("samplekey")).map(_.toSeq).contains(v1.toSeq))
    assert(db.get(b("samplekeyb")).map(_.toSeq).contains(v2.toSeq))
    assert(db.stats()("blobSegments") == 2)
    // the LSM rows carry only blob pointers — no inline values at threshold 0
    assert(db.rawLog().filter("value IS NOT NULL").count() == 0)
    assert(db.rawLog().filter("blobId IS NOT NULL").count() == 2)
    db.close() // parity no-op: the engine stays usable
    assert(db.get(b("samplekey")).map(_.toSeq).contains(v1.toSeq))
  }

  test("blob GC rewrites only live blobs (kv/vlog_test.go:96-136)") {
    val db = freshDb(GraftOptions(valueThreshold = 16, compactTriggerFiles = 1000, gcDiscardRatio = 0.3))
    val mk = (i: Int) => Array.fill[Byte](64)(i.toByte)
    (0 until 10).foreach(i => db.set(b(s"blob$i"), mk(i)))
    (0 until 5).foreach(i => db.del(b(s"blob$i"))) // orphan 5 blobs
    val liveSegsBefore = db.blobSegmentStats().collect { case (bf, lv) if lv > 0 => bf.path }.toSet
    val (live, dead) = db.gcBlobs(maxSegments = 10)
    assert(live == 5 && dead == 5)
    // fully-live segments were never rewritten — same paths survive
    val segsAfter = db.blobSegmentStats().map(_._1.path).toSet
    assert(segsAfter == liveSegsBefore)
    (5 until 10).foreach(i => assert(db.get(b(s"blob$i")).map(_.toSeq).contains(mk(i).toSeq)))
    (0 until 5).foreach(i => assert(db.get(b(s"blob$i")).isEmpty))
  }

  test("per-segment GC: one victim rewritten, other segments untouched (kv/vlog_gc.go:198-253)") {
    val db = freshDb(GraftOptions(valueThreshold = 16, compactTriggerFiles = 1000, gcDiscardRatio = 0.5))
    val mk = (i: Int) => Array.fill[Byte](64)(i.toByte)
    // segment A: 4 blobs, all to die; segments B, C: 4 blobs each, all live
    db.batchSet((0 until 4).map(i => KVEntry(b(s"a$i"), mk(i))))
    db.batchSet((4 until 8).map(i => KVEntry(b(s"b$i"), mk(i))))
    db.batchSet((8 until 12).map(i => KVEntry(b(s"c$i"), mk(i))))
    (0 until 4).foreach(i => db.del(b(s"a$i"))) // kill segment A only
    val before = db.blobSegmentStats()
    assert(before.size == 3)
    val untouched = before.collect { case (bf, lv) if lv > 0 => bf.path }
    assert(untouched.size == 2)
    val (live, dead) = db.gcBlobs() // default: ONE victim per run
    assert(live == 8 && dead == 4)
    val after = db.blobSegmentStats().map(_._1.path)
    assert(after.size == 2 && after.toSet == untouched.toSet,
      "GC must drop exactly the dead segment and leave live segments' files as-is")
    (4 until 12).foreach { i =>
      val k = if (i < 8) s"b$i" else s"c$i"
      assert(db.get(b(k)).map(_.toSeq).contains(mk(i).toSeq))
    }
  }

  test("concurrent gcBlobs from two handles never double-lands a victim's live rows") {
    val dir = Files.createTempDirectory("graftdb").toString
    val opts = GraftOptions(valueThreshold = 16, compactTriggerFiles = 1000, gcDiscardRatio = 0.1)
    val db1 = new GraftDB(spark, dir, opts)
    val mk = (i: Int) => Array.fill[Byte](64)(i.toByte)
    // four blob segments, each half-dead, so BOTH collectors see victims
    (0 until 4).foreach { s =>
      db1.batchSet((0 until 10).map(i => KVEntry(b(f"k$s%d-$i%02d"), mk(s * 10 + i))))
    }
    (0 until 4).foreach { s => (0 until 5).foreach(i => db1.del(b(f"k$s%d-$i%02d"))) }
    val db2 = new GraftDB(spark, dir, opts)
    // the two handles share the per-rootDir commit monitor, but their
    // stats + rewrite phases run OUTSIDE it — they can pick the same
    // victims. The loser's commit must drop replacements whose victim
    // raced away, or every live blobId in that victim lands in TWO blob
    // segments and the view's blob join duplicates those keys.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val f1 = Future(db1.gcBlobs(maxSegments = 10, discardRatio = 0.1))
    val f2 = Future(db2.gcBlobs(maxSegments = 10, discardRatio = 0.1))
    Await.result(Future.sequence(Seq(f1, f2)), 300.seconds)
    assert(db1.scan().count() == 20,
      "blob-join duplication after racing GCs would inflate the visible set")
    (0 until 4).foreach { s =>
      (5 until 10).foreach(i =>
        assert(db1.get(b(f"k$s%d-$i%02d")).map(_.toSeq).contains(mk(s * 10 + i).toSeq)))
    }
    db1.vacuum() // reclaims any orphaned loser rewrite dirs
    assert(db2.scan().count() == 20)
  }

  test("L1 promotion: sustained ingest keeps L1 bounded by l1TargetRows (compact.go:626-751)") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, rangePartitions = 4,
      l1TargetRows = 150))
    val rnd = new scala.util.Random(7)
    (0 until 6).foreach { gen =>
      db.batchSet((0 until 100).map { _ =>
        val k = f"k${rnd.nextInt(400)}%04d"
        KVEntry(b(k), b(s"g$gen-$k"))
      })
      db.compact()
      val st = db.stats()
      assert(st("level0Segments") == 0)
      // L1 stays under target + one compaction's output
      assert(db.levelRows(1) <= 150 + 100,
        s"L1 rows ${db.levelRows(1)} not bounded after gen $gen")
    }
    // L2 exists and holds the promoted mass
    assert(db.levelRows(2) > 0)
    // the merged view is still exact LWW: spot-check a few keys via scan
    val view = db.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value"))).toMap
    assert(view.nonEmpty && view.forall { case (k, v) => v.endsWith(s"-$k") })
    // deletes remain honored across levels (tombstone not dropped early)
    val someKey = view.keys.head
    db.del(b(someKey))
    db.compact()
    assert(db.get(b(someKey)).isEmpty)
  }

  test("leveled promotion: geometric targets build L3+, deletes honored across the tree") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, rangePartitions = 4,
      l1TargetRows = 60, levelSizeMultiplier = 2)) // targets: L1=60, L2=120, L3=240
    val rnd = new scala.util.Random(11)
    (0 until 8).foreach { gen =>
      db.batchSet((0 until 100).map { _ =>
        val k = f"k${rnd.nextInt(500)}%04d"
        KVEntry(b(k), b(s"g$gen-$k"))
      })
      db.compact()
      // compact() drains promotions until every level meets its target
      assert(db.levelRows(1) <= 60, s"L1 over target at gen $gen: ${db.levelRows(1)}")
      assert(db.levelRows(2) <= 120, s"L2 over target at gen $gen: ${db.levelRows(2)}")
    }
    assert(db.levelRows(3) > 0, "geometric ladder never built level 3")
    // the merged view is exact LWW through 4 levels
    val view = db.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value"))).toMap
    assert(view.nonEmpty && view.forall { case (k, v) => v.endsWith(s"-$k") })
    // a delete must not resurrect: tombstones survive until the bottom
    val someKey = view.keys.min
    db.del(b(someKey))
    db.compact()
    assert(db.get(b(someKey)).isEmpty, "tombstone dropped above the bottom level")
    assert(db.view().count() == view.size - 1)
  }

  test("fixed grid: second-generation compaction touches only dirty buckets") {
    // bucketTargetRows pins ~100-row buckets inside the [50, 200] hysteresis
    // band so neither grid refinement nor grid merge fires mid-test
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, rangePartitions = 4,
      bucketTargetRows = 100))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    def bulk(keys: Seq[String]): Unit = db.write(spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(k => org.apache.spark.sql.Row(b(k), b(s"v-$k"))), 4), schema))
    bulk((0 until 400).map(i => f"g$i%04d"))
    assert(db.gridBounds().nonEmpty, "first multi-file bulk write must capture the grid")
    db.compact()
    val l1Before = dbFiles(db)
    // second generation confined to the TOP of the key range: with the
    // fixed grid its L0 files align to the last bucket(s), so compaction
    // must leave the low buckets' L1 files in place
    bulk((380 until 400).map(i => f"g$i%04d"))
    db.compact()
    val l1After = dbFiles(db)
    assert(l1Before.intersect(l1After).nonEmpty,
      "grid-aligned compaction rewrote every L1 file — overlap is not bucket-local")
    assert(db.view().count() == 400)
    (Seq(0, 100, 379, 399)).foreach(i =>
      assert(db.get(b(f"g$i%04d")).map(new String(_)).contains(f"v-g$i%04d")))
  }

  test("grid refinement: skewed ingest into one hot bucket adds a split key and bounds file size") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, rangePartitions = 4,
      bucketTargetRows = 50))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    def bulk(keys: Seq[String]): Unit = db.write(spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(k => org.apache.spark.sql.Row(b(k), b(s"v-$k"))), 4), schema))
    // establish the grid over the full a..z range
    bulk(('a' to 'z').flatMap(c => (0 until 8).map(i => f"$c$i%03d")))
    db.compact()
    val bounds0 = db.gridBounds()
    assert(bounds0.nonEmpty)
    // hammer ONE narrow range: all new keys start with "m" -> one hot bucket
    (0 until 3).foreach { gen =>
      bulk((0 until 120).map(i => f"mm$gen%01d$i%04d"))
      db.compact()
    }
    assert(db.gridBounds().size > bounds0.size,
      "sustained skewed ingest never refined the grid")
    // after refinement, another round must split the hot range across files
    bulk((0 until 120).map(i => f"mz9$i%04d"))
    db.compact()
    val mFiles = db.rawLog()
      .groupBy(org.apache.spark.sql.functions.input_file_name().as("f"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("key")).as("mn"))
      .collect()
    val hotFiles = mFiles.filter(r => new String(r.getAs[Array[Byte]]("mn")).startsWith("m"))
    assert(hotFiles.length >= 2, s"hot range still in one file: ${mFiles.length} files total")
    assert(db.view().count() == 26 * 8 + 3 * 120 + 120)
    assert(db.get(b("mm20010")).map(new String(_)).contains("v-mm20010"))
  }

  test("grid refinement converges in ONE compact call under heavy skew (quantile splits)") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, rangePartitions = 4,
      bucketTargetRows = 50))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    def bulk(keys: Seq[String]): Unit = db.write(spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(k => org.apache.spark.sql.Row(b(k), b(s"v-$k"))), 4), schema))
    bulk(('a' to 'z').flatMap(c => (0 until 8).map(i => f"$c$i%03d")))
    db.compact()
    val bounds0 = db.gridBounds()
    // ONE massively skewed generation: 400 rows into one narrow range —
    // an 8x-over-target file must yield MULTIPLE quantile splits in a
    // single compact() (the old one-split-per-call valve would add 1)
    bulk((0 until 400).map(i => f"mm$i%05d"))
    db.compact()
    val added = db.gridBounds().size - bounds0.size
    assert(added >= 3,
      s"single compact added only $added split(s) for an 8x-over-target file — refinement lags skew")
    assert(db.view().count() == 26 * 8 + 400)
  }

  test("grid merge: delete-heavy workload removes split keys instead of stranding empty buckets") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 1000, rangePartitions = 4,
      bucketTargetRows = 100))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    db.write(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until 400).map(i => org.apache.spark.sql.Row(b(f"m$i%04d"), b(s"v$i"))), 4), schema))
    db.compact()
    val bounds0 = db.gridBounds()
    assert(bounds0.size >= 2, s"need a multi-split grid to merge, got $bounds0")
    // wipe the TOP half of the keyspace: its buckets drop to zero rows after
    // the dead entries are dropped, and their splits stop earning their keep
    db.batchSet((200 until 400).map(i => KVEntry.tombstone(b(f"m$i%04d"))))
    db.compact() // ONE call: the merge drains to fixpoint, not one split per call
    val bounds1 = db.gridBounds()
    assert(bounds1.size < bounds0.size,
      s"emptied buckets never merged: $bounds0 -> $bounds1")
    assert(bounds1.nonEmpty, "merge must stop at the two-bucket floor, not collapse the grid")
    // survivors intact, deletes honored
    assert(db.view().count() == 200)
    assert(db.get(b("m0100")).map(new String(_)).contains("v100"))
    assert(db.get(b("m0300")).isEmpty)
  }

  test("bulk write path: DataFrame generation with blob routing") {
    val db = freshDb(GraftOptions(valueThreshold = 50, compactTriggerFiles = 1000))
    val rows = (0 until 200).map { i =>
      org.apache.spark.sql.Row(b(f"bulk$i%04d"), Array.fill[Byte](if (i % 10 == 0) 80 else 8)(i.toByte))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    db.write(spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema))
    assert(db.view().count() == 200)
    assert(db.get(b("bulk0010")).map(_.length).contains(80))
    assert(db.get(b("bulk0011")).map(_.length).contains(8))
    // overwrite some via a second generation
    db.batchSet(Seq(KVEntry(b("bulk0000"), b("overwritten"))))
    assert(db.get(b("bulk0000")).map(new String(_)).contains("overwritten"))
  }

  test("manifest commit cost stays flat as the file count grows (change-log, not whole-state)") {
    val dir = Files.createTempDirectory("graftdb-logcost").toString
    val db = new GraftDB(spark, dir, GraftOptions(compactTriggerFiles = 100000))
    val log = java.nio.file.Paths.get(dir, "MANIFEST.log")
    def costOfOneSet(i: Int): Long = {
      val before = if (Files.exists(log)) java.nio.file.Files.size(log) else 0L
      db.set(b(f"key-$i%05d"), b("v"))
      java.nio.file.Files.size(log) - before
    }
    val early = costOfOneSet(0)
    (1 until 60).foreach(i => db.set(b(f"key-$i%05d"), b("v")))
    val late = costOfOneSet(60)
    // 61 live L0 segments vs 1: the appended bytes per 1-row set must not
    // scale with the table's file count (the old whole-state rewrite did)
    assert(late <= 2 * early,
      s"1-row set wrote $late log bytes at 61 files vs $early at 1")
    assert(db.view().count() == 61)
  }

  test("bulk-write blob-id reservation is reclaimed to actual usage") {
    val db = freshDb(GraftOptions(valueThreshold = 8, compactTriggerFiles = 1000))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType)))
    def bulk(n: Int, tag: String): Unit = db.write(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until n).map(i => org.apache.spark.sql.Row(b(f"$tag$i%04d"), b(s"blobvalue-$tag-$i"))), 3),
      schema))
    bulk(50, "a"); bulk(50, "bb")
    // two bulk batches provisionally reserve 2^46 ids; with the frontier
    // unraced, each write's final commit shrinks back to max-used+1, so
    // the id space lasts ~2^63 blobs instead of 2^18 batches
    val next = db.stats()("nextBlobId")
    assert(next < (1L << 45),
      s"blob-id reservation never reclaimed: nextBlobId=$next after 2 batches")
    assert(db.view().count() == 100)
    assert(db.get(b("a0001")).map(new String(_)).contains("blobvalue-a-1"))
  }

  test("auto-compaction: the L0 trigger fires through batchSet and keeps L0 bounded") {
    val db = freshDb(GraftOptions(compactTriggerFiles = 3))
    // 8 batches: the 3rd, 6th, ... L0 generations trip the trigger inside
    // batchSet itself (no explicit compact() call anywhere in this test)
    (0 until 8).foreach { gen =>
      db.batchSet((0 until 10).map(i => KVEntry(b(f"ak$i%02d"), b(s"g$gen-$i"))))
    }
    val stats = db.stats()
    assert(stats("level0Segments") < 3,
      s"auto-compaction never fired: ${stats("level0Segments")} L0 segments after 8 batches")
    // the merged view is still exact LWW of the last generation
    val got = db.view().collect()
      .map(r => new String(r.getAs[Array[Byte]]("key")) -> new String(r.getAs[Array[Byte]]("value"))).toMap
    assert(got.size == 10 && got("ak05") == "g7-5")
  }
}
