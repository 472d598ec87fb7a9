package graft.core

import org.apache.spark.sql.types._

/** Core data model of the engine: a flat, ordered keyspace of binary keys to
  * binary values with per-entry metadata, re-expressed as a Spark log table.
  *
  * Mirrors the reference's `Entry` record (reference `kv/utils/entry.go:50-60`):
  *   - `key`       — arbitrary bytes; ordering is unsigned-lexicographic
  *                   (Spark BinaryType ordering == Go `bytes.Compare`).
  *   - `value`     — arbitrary bytes, or null when the value lives in the blob
  *                   table (WiscKey value separation, reference `kv/db.go:79-86`)
  *                   or when the entry is a tombstone (reference `kv/db.go:132-138`).
  *   - `version`   — monotonically increasing commit version; replaces the
  *                   reference's inverted-timestamp key suffix
  *                   (reference `kv/utils/key.go:32-37`): for one user key the
  *                   highest version wins (last-writer-wins).
  *   - `expiresAt` — unix-seconds TTL, 0 = never (reference `kv/utils/entry.go:77-80`).
  *   - `tombstone` — delete marker (reference `BitDelete`, `kv/utils/const.go:25`).
  *   - `blobId`    — non-null when the value is stored out-of-line in the blob
  *                   table (reference `BitValuePointer` + `ValuePtr`,
  *                   `kv/utils/value.go:19-54`); null for inline values.
  */
final case class KVEntry(
    key: Array[Byte],
    value: Array[Byte],
    version: Long,
    expiresAt: Long,
    tombstone: Boolean,
    blobId: java.lang.Long)

/** A row of the resolved (post-LWW, post-visibility) user view. */
final case class ResolvedEntry(
    key: Array[Byte],
    value: Array[Byte],
    version: Long,
    expiresAt: Long)

object KVEntry {
  /** Schema of the persisted log table (one parquet generation per commit). */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = true),
    StructField("version", LongType, nullable = false),
    StructField("expiresAt", LongType, nullable = false),
    StructField("tombstone", BooleanType, nullable = false),
    StructField("blobId", LongType, nullable = true)))

  /** Schema of the blob (value-log analog) table: out-of-line large values
    * (reference vlog record, `kv/file/vlog.go:150-191`). */
  val blobSchema: StructType = StructType(Seq(
    StructField("blobId", LongType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  def apply(key: Array[Byte], value: Array[Byte]): KVEntry =
    KVEntry(key, value, 0L, 0L, tombstone = false, null)

  def withTTL(key: Array[Byte], value: Array[Byte], ttlSeconds: Long): KVEntry =
    KVEntry(key, value, 0L, System.currentTimeMillis() / 1000 + ttlSeconds,
      tombstone = false, null)

  def tombstone(key: Array[Byte]): KVEntry =
    KVEntry(key, null, 0L, 0L, tombstone = true, null)
}
