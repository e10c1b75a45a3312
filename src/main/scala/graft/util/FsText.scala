package graft.util

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Tiny durable-text-value store over the Hadoop FileSystem API — the
  * engine's offset/watermark/high-water-mark persistence. Goes through
  * `Path.getFileSystem` (NOT java.nio): at scale these values live next
  * to the destination tables on HDFS/object storage, not on whichever
  * machine happens to run the driver. Single-writer semantics (one mirror
  * owns its state file), matching the reference's per-flow catalog rows. */
object FsText {

  def read(path: String, conf: Configuration): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Atomic replace: write a temp sibling, then rename over the target
    * (FileContext rename-with-OVERWRITE is atomic on HDFS/posix-like
    * stores), so a reader — or a crashed writer — never observes a
    * half-written value. Concurrent WRITERS are still the caller's
    * problem: the store is single-writer (one mirror/catalog owns its
    * file); two catalogs over one dir can lose updates to each other
    * even with atomic replace. */
  def write(path: String, value: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp.${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException
          if fs.exists(tmp) =>
        // Stores without FileContext rename: non-atomic fallback.
        if (fs.exists(p)) fs.delete(p, false)
        if (!fs.rename(tmp, p)) {
          fs.delete(tmp, false)
          throw new java.io.IOException(s"atomic replace of $path failed")
        }
    }
  }

  /** Remove a value file (no-op when absent). */
  def delete(path: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
  }
}
