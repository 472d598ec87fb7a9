package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.json4s._
import org.json4s.jackson.Serialization

/** Metadata for one live data file (a sorted parquet "generation" segment).
  * Min/max keys are hex-encoded so the manifest JSON stays binary-safe; they
  * drive file pruning on point reads (analog of the reference's per-table
  * `[minKey, maxKey]` search, `kv/lsm/level_handler.go:45-64`).
  */
final case class FileMeta(
    path: String,
    level: Int,
    minKeyHex: String,
    maxKeyHex: String,
    rows: Long,
    createdVersion: Long)

final case class BlobFileMeta(path: String, rows: Long)

/** The full engine state committed atomically. `nextVersion` is the
  * monotonic commit counter that replaces the reference's inverted-ts
  * versioning (`kv/utils/key.go:32-37`); `nextBlobId` allocates blob ids.
  *
  * `rangeBoundsHex` is the FIXED bucket grid (hex split keys, ascending)
  * established by the first bulk write: every later segment write
  * partitions against this grid instead of re-sampling its own range
  * boundaries, so files from different generations align on the same
  * sub-ranges and L0→L1 compaction stays local to the touched buckets
  * (the analog of the reference's stable per-level key-range targets,
  * `kv/lsm/compact.go:626-751`). Empty until the first multi-file write;
  * json4s fills the default for manifests written before this field.
  */
final case class ManifestState(
    nextVersion: Long,
    nextBlobId: Long,
    files: Vector[FileMeta],
    blobFiles: Vector[BlobFileMeta],
    rangeBoundsHex: Vector[String] = Vector.empty) {
  def liveDataPaths: Seq[String] = files.map(_.path)
}

/** Replayable-log-free manifest: unlike the reference's append-only change
  * log with rewrite thresholds (`kv/file/manifest.go:122-174,291-348`), we
  * write the whole (tiny) state and commit via atomic rename — the same
  * crash-consistency guarantee with none of the replay machinery. A single
  * in-process lock serializes committers, mirroring the reference's single
  * writer goroutine (`kv/db.go:224-285`).
  */
final class Manifest(rootDir: String) {
  private implicit val fmts: Formats = DefaultFormats
  private val manifestPath: Path = Paths.get(rootDir, "MANIFEST.json")
  private val tmpPath: Path = Paths.get(rootDir, "MANIFEST.json.tmp")
  private val lock = new Object

  Files.createDirectories(Paths.get(rootDir))

  def load(): ManifestState = lock.synchronized {
    if (Files.exists(manifestPath))
      Serialization.read[ManifestState](Files.readString(manifestPath))
    else ManifestState(1L, 1L, Vector.empty, Vector.empty)
  }

  /** Atomically transform the state. Returns the committed new state. */
  def commit(f: ManifestState => ManifestState): ManifestState = lock.synchronized {
    val next = f(load())
    Files.writeString(tmpPath, Serialization.write(next))
    Files.move(tmpPath, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }
}

object Hex {
  private val digits = "0123456789abcdef".toCharArray
  def encode(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach { b => sb.append(digits((b >> 4) & 0xf)).append(digits(b & 0xf)) }
    sb.toString
  }
  def decode(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
}
