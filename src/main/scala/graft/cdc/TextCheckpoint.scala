package graft.cdc

/** Text-checkpoint semantics for sources whose resume position is not an
  * integer — the comparison/merge rules behind `CdcCheckpoint.Text`
  * (flow/model/cdc_stream.go:33-36):
  *
  *   - MySQL: a GTID SET ("uuid:1-5:7,uuid2:1-3"). Progress is a partial
  *     order by set containment — a checkpoint is newer iff it contains
  *     every transaction of the other (public MySQL replication
  *     semantics; the reference resumes by handing the set back to the
  *     server).
  *   - MongoDB: an opaque resume token, hex-encoded and designed to be
  *     byte-comparable — a total order by lexicographic compare.
  *
  * The streaming source itself orders batches by the engine-assigned
  * monotonic `cp`; these rules exist for RESUME VALIDATION (is the stored
  * text checkpoint behind the source's current position?) and for merging
  * checkpoints of parallel shards.
  */
object TextCheckpoint {

  /** A MySQL GTID set: source-uuid → disjoint, sorted, inclusive
    * transaction-id intervals. */
  final case class GtidSet(intervals: Map[String, List[(Long, Long)]]) {

    /** Canonical text form: uuids sorted, intervals merged+sorted,
      * single-id intervals render bare ("uuid:5", not "uuid:5-5"). */
    def render: String =
      intervals.toSeq.sortBy(_._1).map { case (uuid, ivs) =>
        uuid + ":" + ivs.map { case (a, b) =>
          if (a == b) a.toString else s"$a-$b"
        }.mkString(":")
      }.mkString(",")

    def containsTx(uuid: String, tx: Long): Boolean =
      intervals.getOrElse(uuid.toLowerCase, Nil)
        .exists { case (a, b) => a <= tx && tx <= b }

    /** Set containment: every interval of `o` is covered here — "this is
      * at least as far along as o". */
    def contains(o: GtidSet): Boolean =
      o.intervals.forall { case (uuid, ivs) =>
        val mine = intervals.getOrElse(uuid, Nil)
        ivs.forall { case (a, b) =>
          mine.exists { case (ma, mb) => ma <= a && b <= mb }
        }
      }

    def isNewerThan(o: GtidSet): Boolean = contains(o) && this != o

    /** Union — merging checkpoints of parallel shards / reconnects. */
    def merge(o: GtidSet): GtidSet = GtidSet(
      (intervals.keySet ++ o.intervals.keySet).map { uuid =>
        uuid -> GtidSet.normalize(
          intervals.getOrElse(uuid, Nil) ++ o.intervals.getOrElse(uuid, Nil))
      }.toMap)

    /** Comparable (total) only when one side contains the other; GTID
      * progress is genuinely partial — divergent sets return None. */
    def tryCompare(o: GtidSet): Option[Int] =
      if (this == o) Some(0)
      else if (contains(o)) Some(1)
      else if (o.contains(this)) Some(-1)
      else None
  }

  object GtidSet {
    val empty: GtidSet = GtidSet(Map.empty)

    /** Merge overlapping/adjacent inclusive intervals. */
    private[TextCheckpoint] def normalize(ivs: List[(Long, Long)])
        : List[(Long, Long)] =
      ivs.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
        case ((a, b) :: rest, (c, d)) if c <= b + 1 =>
          (a, math.max(b, d)) :: rest
        case (acc, iv) => iv :: acc
      }.reverse

    /** Parse "uuid:1-5:7,uuid2:3". Tolerates whitespace; uuids fold to
      * lower case; intervals normalize (so parse∘render is stable). */
    def parse(s: String): GtidSet =
      if (s == null || s.trim.isEmpty) empty
      else GtidSet(s.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
        val pieces = part.split(":")
        require(pieces.length >= 2, s"malformed GTID '$part'")
        val uuid = pieces(0).trim.toLowerCase
        val ivs = pieces.drop(1).map { r =>
          r.split("-") match {
            case Array(a) => (a.trim.toLong, a.trim.toLong)
            case Array(a, b) => (a.trim.toLong, b.trim.toLong)
            case _ => throw new IllegalArgumentException(
              s"malformed GTID interval '$r'")
          }
        }.toList
        uuid -> normalize(ivs)
      }.groupBy(_._1).view.mapValues(g =>
        normalize(g.flatMap(_._2).toList)).toMap)
  }

  /** A MariaDB GTID position set: replication domain → (serverId, seq),
    * text form "0-1-42,1-2-10" (at most one position per domain — the
    * public MariaDB gtid_slave_pos contract; the reference carries this
    * flavor through go-mysql's MariadbGTIDSet). Progress ordering is
    * per-domain sequence dominance: a position is at-least-as-far iff
    * every domain of the other is present with seq ≥ — serverId is
    * provenance, not order. */
  final case class MariadbGtidSet(positions: Map[Long, (Long, Long)]) {

    def render: String = positions.toSeq.sortBy(_._1)
      .map { case (d, (s, q)) => s"$d-$s-$q" }.mkString(",")

    def contains(o: MariadbGtidSet): Boolean =
      o.positions.forall { case (d, (_, q)) =>
        positions.get(d).exists(_._2 >= q)
      }

    def isNewerThan(o: MariadbGtidSet): Boolean =
      contains(o) && seqView != o.seqView

    /** Per-domain max-seq union (reconnect / shard merge). */
    def merge(o: MariadbGtidSet): MariadbGtidSet = MariadbGtidSet(
      (positions.keySet ++ o.positions.keySet).map { d =>
        d -> (positions.get(d).toSeq ++ o.positions.get(d).toSeq)
          .maxBy(_._2)
      }.toMap)

    def tryCompare(o: MariadbGtidSet): Option[Int] =
      if (seqView == o.seqView) Some(0)
      else if (contains(o)) Some(1)
      else if (o.contains(this)) Some(-1)
      else None

    private def seqView: Map[Long, Long] =
      positions.view.mapValues(_._2).toMap
  }

  object MariadbGtidSet {
    val empty: MariadbGtidSet = MariadbGtidSet(Map.empty)

    /** Looks like "domain-server-seq[,...]"? (vs a uuid-keyed MySQL set) */
    def looksLike(s: String): Boolean =
      s.nonEmpty && s.split(",").forall(
        _.trim.matches("""\d+-\d+-\d+"""))

    def parse(s: String): MariadbGtidSet =
      if (s.trim.isEmpty) empty
      else MariadbGtidSet(s.split(",").map { part =>
        part.trim.split("-") match {
          case Array(d, sv, q) => d.toLong -> (sv.toLong, q.toLong)
          case _ => throw new IllegalArgumentException(
            s"malformed MariaDB GTID '$part' — need domain-server-seq")
        }
      }.toMap)
  }

  /** MySQL checkpoint-text flavors. ONE detector shared by resume
    * skipping, decoder seeding, and the capture-lag gauge so their
    * interpretations can never diverge: a stored file:pos offset meeting
    * a GTID commit (the stream gained GTID events between runs) must be
    * treated as a flavor mismatch everywhere, not parsed as the wrong
    * kind in one place. */
  sealed trait Flavor
  case object FilePos extends Flavor
  case object MysqlGtid extends Flavor
  case object MariaGtid extends Flavor

  def flavor(s: String): Flavor =
    if (MariadbGtidSet.looksLike(s)) MariaGtid
    // a MySQL GTID set leads with a 36-char server uuid before ':'
    else if (s.contains(":") && s.takeWhile(_ != ':').length == 36)
      MysqlGtid
    else FilePos

  /** Mongo-style opaque resume token: totally ordered by byte-lexicographic
    * compare of its hex form (the public contract of resume-token
    * ordering within one stream). */
  def compareResumeTokens(a: String, b: String): Int = {
    // Same-length hex strings compare lexicographically as bytes; a
    // shorter token sorts before a longer one with the same prefix.
    val c = a.compareTo(b)
    if (a.length == b.length) Integer.signum(c)
    else if (a.startsWith(b)) 1
    else if (b.startsWith(a)) -1
    else Integer.signum(c)
  }
}
