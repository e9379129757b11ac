package graft.streaming

import java.io.{File, FileNotFoundException}
import java.nio.file.{FileAlreadyExistsException => NioFileAlreadyExists, Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, FSDataOutputStream, FSInputStream, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Local-filesystem [[CheckpointFileManager]] on pure `java.nio` — the
  * per-op insert path's WAL writer (select it with
  * `spark.sql.streaming.checkpointFileManagerClass`).
  *
  * Why it exists: with no libhadoop native loaded (the common case in
  * containers), BOTH built-in managers fork a shell process per
  * metadata-log file — the FileContext manager runs `readlink` inside
  * every rename's link-status probe, and the FileSystem manager runs
  * `chmod` inside every `create` (`RawLocalFileSystem.setPermission`).
  * Stack-sampling the insert bench showed those forks cost ~35 ms and
  * ~10 ms per WAL file respectively — the dominant slice of a singleton
  * micro-batch, and none of it inherent to the commit protocol. This
  * manager keeps the exact same atomic-rename protocol (write to a
  * hidden temp file, `ATOMIC_MOVE` into place) with zero process forks
  * and zero Hadoop local-FS overhead. Local paths only — a real cluster
  * points the checkpoint at DFS and keeps the default manager.
  */
class NioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)

  private def createTempFile(path: Path): FSDataOutputStream = {
    val p = nio(path)
    Files.createDirectories(p.getParent)
    new FSDataOutputStream(Files.newOutputStream(p), null)
  }

  override def createAtomic(path: Path,
                            overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val tmp = new Path(path.getParent, s".${path.getName}.${UUID.randomUUID}.tmp")
    val fm = this
    new CancellableFSDataOutputStream(createTempFile(tmp)) {
      private var terminated = false
      override def close(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          super.close()
          fm.renameTempFile(tmp, path, overwriteIfPossible)
        }
      }
      override def cancel(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          try super.close() catch { case _: Throwable => () }
          Files.deleteIfExists(nio(tmp))
        }
      }
    }
  }

  private def renameTempFile(srcPath: Path, dstPath: Path,
                             overwriteIfPossible: Boolean): Unit =
    try {
      if (overwriteIfPossible)
        Files.move(nio(srcPath), nio(dstPath), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      else if (Files.exists(nio(dstPath))) {
        // match the built-in managers: a losing concurrent writer just
        // drops its temp file; the winner's content stands
        Files.deleteIfExists(nio(srcPath))
        throw new FileAlreadyExistsException(
          s"rename destination $dstPath already exists")
      } else Files.move(nio(srcPath), nio(dstPath), StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case _: NioFileAlreadyExists =>
        Files.deleteIfExists(nio(srcPath))
        throw new FileAlreadyExistsException(
          s"rename destination $dstPath already exists")
    }

  override def open(path: Path): FSDataInputStream = {
    if (!Files.exists(nio(path))) throw new FileNotFoundException(path.toString)
    new FSDataInputStream(new NioFSInputStream(nio(path)))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = nio(path)
    if (!Files.exists(dir)) throw new FileNotFoundException(path.toString)
    import scala.jdk.CollectionConverters._
    // Files.list holds a directory fd until closed — the iterator alone
    // never releases it, and the metadata log lists on every batch purge,
    // so a leak here walks a long bench JVM into 'Too many open files'
    val s = Files.list(dir)
    try s.iterator().asScala
      .map(p => toStatus(p.toFile))
      .filter(st => filter.accept(st.getPath))
      .toArray
    finally s.close()
  }

  private def toStatus(f: File): FileStatus =
    new FileStatus(f.length(), f.isDirectory, 1, 4096, f.lastModified(),
      new Path(f.toURI))

  override def mkdirs(path: Path): Unit = Files.createDirectories(nio(path))

  override def exists(path: Path): Boolean = Files.exists(nio(path))

  override def delete(path: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val p = nio(path)
    if (Files.exists(p)) {
      val w = Files.walk(p)
      val all = try w.iterator().asScala.toSeq finally w.close()
      all.reverse
        .foreach(f => try Files.deleteIfExists(f) catch { case _: Throwable => () })
    }
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    Files.createDirectories(nio(root))
    root
  }
}

/** Minimal seekable/positioned-read stream over a local file — what
  * [[FSDataInputStream]] requires of its inner stream. The metadata logs
  * read each file once, sequentially; a plain buffered channel read
  * suffices. */
private[streaming] class NioFSInputStream(p: java.nio.file.Path) extends FSInputStream {
  private val raf = new java.io.RandomAccessFile(p.toFile, "r")

  override def seek(pos: Long): Unit = raf.seek(pos)
  override def getPos: Long = raf.getFilePointer
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int = raf.read()
  override def read(b: Array[Byte], off: Int, len: Int): Int = raf.read(b, off, len)
  override def close(): Unit = raf.close()
}
