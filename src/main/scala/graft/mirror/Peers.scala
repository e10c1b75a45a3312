package graft.mirror

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** A named, typed external connection — the reference's Peer abstraction
  * (flow/connectors/core.go:464-554, protos/peers.proto) restated as a
  * Spark source/sink configuration: `kind` maps to a DataFrame format and
  * `options` to its reader/writer options. The catalog is a plain
  * in-memory registry (persist as JSON alongside checkpoints if needed).
  */
final case class Peer(name: String, kind: String,
    options: Map[String, String]) {

  /** Batch read through this peer (QRep source path). */
  def read(spark: SparkSession): DataFrameReader =
    spark.read.format(kind).options(options)

  def load(spark: SparkSession, path: String): DataFrame =
    read(spark).load(path)
}

/** Peer registry. With `persistPath` set, the catalog is durable: every
  * create/drop rewrites one text file through the Hadoop FileSystem API
  * (same [[graft.util.FsText]] store as offsets/watermarks — lives next
  * to the data on HDFS/object storage), and a new catalog instance
  * reloads it — peers survive driver restarts like the reference's
  * catalog rows (flow catalog `peers` table). Single-writer semantics.
  * Line format: URL-encoded `name TAB kind TAB k=v&k=v`. */
final class PeerCatalog(persistPath: Option[String] = None,
    hadoopConf: org.apache.hadoop.conf.Configuration =
      new org.apache.hadoop.conf.Configuration()) {
  private val peers =
    scala.collection.concurrent.TrieMap.empty[String, Peer]

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) =
    java.net.URLDecoder.decode(s, "UTF-8")

  persistPath.foreach { path =>
    graft.util.FsText.read(path, hadoopConf).foreach { text =>
      text.linesIterator.filter(_.nonEmpty).foreach { line =>
        val Array(n, k, opts) = line.split("\t", -1)
        val o = opts.split("&").filter(_.nonEmpty).map { kv =>
          val Array(ok, ov) = kv.split("=", 2)
          dec(ok) -> dec(ov)
        }.toMap
        peers.put(dec(n), Peer(dec(n), dec(k), o))
      }
    }
  }

  private def save(): Unit = persistPath.foreach { path =>
    val text = list.map { p =>
      val opts = p.options.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      s"${enc(p.name)}\t${enc(p.kind)}\t$opts"
    }.mkString("\n")
    graft.util.FsText.write(path, text, hadoopConf)
  }

  def create(p: Peer): Unit = {
    require(!peers.contains(p.name), s"peer ${p.name} exists")
    peers.put(p.name, p)
    save()
  }
  def drop(name: String): Unit = { peers.remove(name); save() }
  /** In-place option update of an existing entry (tags, option edits);
    * the entry must exist. */
  def update(p: Peer): Unit = {
    require(peers.contains(p.name), s"peer ${p.name} does not exist")
    peers.put(p.name, p)
    save()
  }
  def get(name: String): Peer =
    peers.getOrElse(name, throw new NoSuchElementException(s"peer $name"))
  def list: Seq[Peer] = peers.values.toSeq.sortBy(_.name)
}
