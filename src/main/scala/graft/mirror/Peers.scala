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

final class PeerCatalog {
  private val peers =
    scala.collection.concurrent.TrieMap.empty[String, Peer]

  def create(p: Peer): Unit = {
    require(!peers.contains(p.name), s"peer ${p.name} exists")
    peers.put(p.name, p)
  }
  def drop(name: String): Unit = peers.remove(name)
  def get(name: String): Peer =
    peers.getOrElse(name, throw new NoSuchElementException(s"peer $name"))
  def list: Seq[Peer] = peers.values.toSeq.sortBy(_.name)
}
