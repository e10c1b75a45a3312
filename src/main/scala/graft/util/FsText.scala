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

  def write(path: String, value: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}
