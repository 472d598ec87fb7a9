package graft.core

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of [[GraftDB.changesBetween]] — the snapshot-to-snapshot
  * change feed. The oracled row (`kv_engine_diff`) certifies the bulk
  * path; these cover the edges the testdata can't reach: identical
  * snapshots, compaction-only deltas, born-and-died keys, redundant
  * rewrites, TTL flips, and blob-routed values.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def fresh(opts: GraftOptions = GraftOptions(compactTriggerFiles = 1000)) =
    new GraftDB(spark, Files.createTempDirectory("graft-cf").toString, opts)

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def collect(df: org.apache.spark.sql.DataFrame): Set[(String, String, Option[String])] =
    df.collect().map { r =>
      (new String(r.getAs[Array[Byte]]("key"), "UTF-8"), r.getString(1),
        Option(r.getAs[Array[Byte]]("value")).map(new String(_, "UTF-8")))
    }.toSet

  test("identical snapshots and compaction-only deltas diff to nothing") {
    val db = fresh()
    db.batchSet((0 until 20).map(i => KVEntry(b(f"k$i%03d"), b(s"v$i"))))
    db.batchSet((20 until 40).map(i => KVEntry(b(f"k$i%03d"), b(s"v$i"))))
    val s1 = db.snapshot()
    assert(db.changesBetween(s1, s1).isEmpty, "same snapshot must diff empty")
    // pure compaction between snapshots: the manifests share nothing,
    // every key is a candidate, and ALL of them must diff away — the
    // feed reports logical change, not physical layout
    db.compact()
    val s2 = db.snapshot()
    assert(db.changesBetween(s1, s2).isEmpty,
      "compaction-only delta leaked physical rewrites into the feed")
    // a redundant logical rewrite DOES carry a new version — reported as
    // a set (an idempotent re-apply), never as a del or a value change
    db.batchSet((0 until 40).map(i => KVEntry(b(f"k$i%03d"), b(s"v$i"))))
    val s3 = db.snapshot()
    val d = collect(db.changesBetween(s2, s3))
    assert(d.size == 40 &&
      d.forall { case (_, op, v) => op == "set" && v.exists(_.startsWith("v")) },
      s"unexpected rows in rewrite diff: ${d.take(5)}")
  }

  test("set/del/born-and-died semantics across the window") {
    val db = fresh()
    db.batchSet(Seq(KVEntry(b("a"), b("1")), KVEntry(b("b"), b("2")),
      KVEntry(b("c"), b("3"))))
    val s1 = db.snapshot()
    db.set(b("a"), b("1x"))      // update
    db.del(b("b"))               // delete
    db.set(b("d"), b("4"))       // insert
    db.set(b("e"), b("5")); db.del(b("e")) // born and died: nets out
    val s2 = db.snapshot()
    assert(collect(db.changesBetween(s1, s2)) == Set(
      ("a", "set", Some("1x")), ("b", "del", None), ("d", "set", Some("4"))))
    // reverse direction: the feed that would roll the replica back
    assert(collect(db.changesBetween(s2, s1)) == Set(
      ("a", "set", Some("1")), ("b", "set", Some("2")), ("d", "del", None)))
  }

  test("TTL visibility evaluated at one asOf on both sides") {
    val db = fresh()
    val now = System.currentTimeMillis() / 1000
    db.batchSet(Seq(KVEntry(b("t1"), b("v1")).copy(expiresAt = now + 1000)))
    val s1 = db.snapshot()
    // re-write with an ALREADY-EXPIRED ttl: at asOf=now the key flips dead
    db.batchSet(Seq(KVEntry(b("t1"), b("v2")).copy(expiresAt = now - 10)))
    val s2 = db.snapshot()
    assert(collect(db.changesBetween(s1, s2, asOfUnixSec = now)) ==
      Set(("t1", "del", None)))
  }

  test("replication round-trip: backup + applied change feed equals the primary") {
    val db = fresh()
    db.batchSet((0 until 30).map(i => KVEntry(b(f"r$i%03d"), b(s"v$i"))))
    val s1 = db.snapshot()
    val replicaDir = Files.createTempDirectory("graft-cf-replica").toString
    db.backupTo(replicaDir) // full sync at s1 (backup pins the current state)
    // primary moves on: updates, deletes, inserts
    (0 until 30 by 3).foreach(i => db.set(b(f"r$i%03d"), b(s"v$i-updated")))
    (0 until 30 by 5).foreach(i => db.del(b(f"r$i%03d")))
    db.set(b("r999"), b("late-arrival"))
    db.compact()
    val s2 = db.snapshot()
    // catch-up: the feed applies as one ordinary write batch (del = null
    // value, the engine's own tombstone convention)
    val replica = GraftDB.openBackup(spark, replicaDir)
    replica.write(db.changesBetween(s1, s2)
      .select(col("key"),
        when(col("op") === "del", lit(null).cast("binary"))
          .otherwise(col("value")).as("value")))
    def state(v: org.apache.spark.sql.DataFrame) =
      v.collect().map(r => (new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"))).toSet
    assert(state(replica.view()) == state(db.view()),
      "replica diverged from primary after feed apply")
  }

  test("model fuzz: every adjacent-snapshot diff equals the model across random histories") {
    val rnd = new scala.util.Random(2026_08_14L)
    for (round <- 0 until 2) {
      val db = fresh(GraftOptions(compactTriggerFiles = 3))
      val model = scala.collection.mutable.Map[String, String]()
      val keys = (0 until 30).map(i => f"f$i%02d")
      var prevSnap = { db.set(b("seed"), b("s")); model("seed") = "s"; db.snapshot() }
      var prevModel = model.toMap
      for (step <- 0 until 6) {
        // a random batch of sets/deletes (+ occasional compact)
        val ops = (0 until 1 + rnd.nextInt(8)).map { _ =>
          val k = keys(rnd.nextInt(keys.length))
          if (rnd.nextInt(4) == 0 && model.contains(k)) { model.remove(k); KVEntry.tombstone(b(k)) }
          else { val v = s"v$step-${rnd.nextInt(99)}"; model(k) = v; KVEntry(b(k), b(v)) }
        }
        // intra-batch duplicate keys resolve LWW nondeterministically at
        // equal versions — keep the model simple by deduping to last-wins
        val dedup = ops.reverse.distinctBy(e => new String(e.key, "UTF-8")).reverse
        // re-apply the dedup to the model (ops above already mutated it in
        // order; rebuild from prevModel + dedup for exactness)
        val m2 = scala.collection.mutable.Map(prevModel.toSeq: _*)
        dedup.foreach { e =>
          val k = new String(e.key, "UTF-8")
          if (e.tombstone) m2.remove(k) else m2(k) = new String(e.value, "UTF-8")
        }
        model.clear(); model ++= m2
        db.batchSet(dedup)
        if (rnd.nextInt(3) == 0) db.compact()
        val snap = db.snapshot()
        val expect: Set[(String, String, Option[String])] =
          (prevModel.keySet ++ model.keySet).flatMap { k =>
            (prevModel.get(k), model.get(k)) match {
              case (a, Some(bv)) if !a.contains(bv) => Some((k, "set", Some(bv)))
              case (Some(_), None) => Some((k, "del", None))
              case _ => None
            }
          }
        val got = collect(db.changesBetween(prevSnap, snap))
        assert(got == expect,
          s"round $round step $step: missing=${expect -- got} extra=${got -- expect}")
        prevSnap = snap; prevModel = model.toMap
      }
    }
  }

  test("blob-routed values surface resolved in the feed") {
    val db = fresh(GraftOptions(valueThreshold = 4, compactTriggerFiles = 1000))
    db.set(b("big"), b("tiny"))
    val s1 = db.snapshot()
    db.set(b("big"), b("a-large-blob-routed-value"))
    val s2 = db.snapshot()
    assert(collect(db.changesBetween(s1, s2)) ==
      Set(("big", "set", Some("a-large-blob-routed-value"))))
  }
}
