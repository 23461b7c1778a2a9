package graft.pipeline

/** The delta-log protocol's filesystem seam (SCALE.md r17 port note
  * made real — the rename-free claim enforced by an interface instead
  * of prose). [[MinMergeStats]] drives every directory listing, sweep,
  * and small-file write through these six primitives, each chosen to
  * map ONE-FOR-ONE onto the Hadoop `FileSystem` API for the
  * object-store deployment:
  *
  *  - [[listDirs]]  → `listStatus(path).filter(_.isDirectory)`
  *  - [[exists]]    → `exists(path)`
  *  - [[delete]]    → `delete(path, recursive = true)`
  *  - [[putAtomic]] → `create(path, overwrite = true)` single-shot PUT
  *                    (atomic at object granularity on S3-class stores)
  *  - [[read]]      → `open(path)` + full read
  *  - [[mkdirs]]    → `mkdirs(path)`
  *
  * Deliberately ABSENT: rename — the one primitive that is neither
  * atomic nor cheap on S3-class stores. The local implementation's
  * temp-sibling + ATOMIC_MOVE inside [[LocalDeltaStore.putAtomic]] is
  * an implementation detail of the local PUT, not a protocol
  * dependency: on an object store the single-shot PUT is itself
  * atomic and the temp file disappears from the port. Data files
  * (the `__delta=N/__bucket=K` parquet) land via Spark's committer,
  * already object-store-proven, and never move afterwards — compaction
  * and rebuild write NEW deltas and sweep old ones.
  */
private[pipeline] trait DeltaStore {

  /** Names (not paths) of `dir`'s immediate child DIRECTORIES; empty
    * when `dir` is absent or has none.
    */
  def listDirs(dir: String): Seq[String]

  def exists(path: String): Boolean

  /** Recursive delete; a no-op when `path` is absent. */
  def delete(path: String): Unit

  /** All-or-nothing small-file write: a concurrent reader observes the
    * complete content or no file, never a torn prefix.
    */
  def putAtomic(path: String, content: String): Unit

  /** Full UTF-8 content of a small file, trimmed. */
  def read(path: String): String

  def mkdirs(path: String): Unit
}

/** java.nio implementation for the sandbox's local-filesystem
  * warehouse; the cluster deployment slots a Hadoop `FileSystem`
  * implementation behind the same trait.
  */
private[pipeline] object LocalDeltaStore extends DeltaStore {
  import java.io.File
  import java.nio.charset.StandardCharsets.UTF_8
  import java.nio.file.{Files, StandardCopyOption}

  override def listDirs(dir: String): Seq[String] =
    Option(new File(dir).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName)

  override def exists(path: String): Boolean = new File(path).exists()

  override def delete(path: String): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete(): Unit
    }
    rm(new File(path))
  }

  override def putAtomic(path: String, content: String): Unit = {
    val f = new File(path)
    val tmp = Files.createTempFile(f.getParentFile.toPath, f.getName, ".tmp")
    // the temp sibling must not outlive a failed write/move (r18
    // advisor): listDirs ignores files so a leaked .tmp is invisible
    // to the protocol, but crashing writers would accumulate them in
    // the table root forever
    try {
      Files.write(tmp, content.getBytes(UTF_8)): Unit
      Files.move(tmp, f.toPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
    } finally Files.deleteIfExists(tmp): Unit
  }

  override def read(path: String): String =
    new String(Files.readAllBytes(new File(path).toPath), UTF_8).trim

  override def mkdirs(path: String): Unit =
    new File(path).mkdirs(): Unit
}
