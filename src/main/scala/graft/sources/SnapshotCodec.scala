package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Pluggable snapshot compression (reference: CompressionInstanceProvider,
  * S3StreamingWriter.kt:100-101 — the provider supplies BOTH the
  * compressor-stream wrapper and the filename extension that is baked into
  * the object key `…-NNNNNN.txt.<ext>.enc`). Implementations must be
  * stateless and serializable: one instance is closed over by every writer
  * task. Codecs available here ride Spark's own classpath (zstd-jni ships
  * with Spark for shuffle/event-log compression) — no extra dependency.
  */
trait SnapshotCodec extends Serializable {
  /** Extension between `.txt.` and `.enc` in the object key. */
  def extension: String
  def compress(out: OutputStream): OutputStream
  def decompress(in: InputStream): InputStream
}

/** The reference's default (CompressionInstanceProvider default "gz"). */
object GzipSnapshotCodec extends SnapshotCodec {
  val extension = "gz"
  def compress(out: OutputStream): OutputStream = new GZIPOutputStream(out)
  def decompress(in: InputStream): InputStream = new GZIPInputStream(in)
}

/** zstd via Spark's bundled zstd-jni — faster and denser than gzip; the
  * scale choice for new snapshots (the reference kept gzip for consumer
  * compatibility). */
object ZstdSnapshotCodec extends SnapshotCodec {
  val extension = "zst"
  def compress(out: OutputStream): OutputStream =
    new com.github.luben.zstd.ZstdOutputStream(out)
  def decompress(in: InputStream): InputStream =
    new com.github.luben.zstd.ZstdInputStream(in)
}

/** No compression (`…-NNNNNN.txt.enc`-style keys use extension "txt"‑less
  * naming in the reference only for manifests; kept here for debugging). */
object IdentitySnapshotCodec extends SnapshotCodec {
  val extension = "raw"
  def compress(out: OutputStream): OutputStream = out
  def decompress(in: InputStream): InputStream = in
}
