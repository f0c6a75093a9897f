package graft.storage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** File-backed string->string map with atomic persistence — the offset /
  * checkpoint store (reference: lib/storage/persistedmap/persistedmap.go:1-83,
  * sources/dynamodb/offsets/).
  *
  * Reader flushes its map to a temp file and renames over the target (crash
  * safe); identical discipline here. Spark's own streaming checkpoints cover
  * structured-streaming offsets (see graft.streaming); this class is for
  * driver-side bookkeeping the engine itself owns — e.g. last-snapshotted PK
  * bounds per table.
  *
  * Encoding is line-based `key<TAB>value` with URL-escaped keys/values
  * rather than JSON: zero dependencies and injective for arbitrary strings.
  */
final class PersistedMap(path: Path) {
  private val data = mutable.LinkedHashMap.empty[String, String]
  load()

  private def esc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def unesc(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  private def load(): Unit =
    if (Files.exists(path)) {
      Files.readAllLines(path, StandardCharsets.UTF_8).asScala.foreach { line =>
        line.split("\t", 2) match {
          case Array(k, v) => data(unesc(k)) = unesc(v)
          case _           => // skip malformed line (truncated write pre-rename)
        }
      }
    }

  def get(key: String): Option[String] = synchronized(data.get(key))

  def put(key: String, value: String): Unit = synchronized {
    data(key) = value
    flush()
  }

  def remove(key: String): Unit = synchronized {
    data.remove(key)
    flush()
  }

  def snapshot: Map[String, String] = synchronized(data.toMap)

  /** Write-all + atomic rename, as persistedmap.go does on its flush tick. */
  private def flush(): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    if (path.getParent != null) Files.createDirectories(path.getParent)
    val body = data.map { case (k, v) => s"${esc(k)}\t${esc(v)}" }.mkString("\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}

object PersistedMap {
  def apply(path: String): PersistedMap = new PersistedMap(Paths.get(path))
}
