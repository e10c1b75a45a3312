package graft.qrep

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.cdc.{Bson, CaptureEndpoint, MongoSession, MongoWire}

/** LIVE QRep source for MongoDB: partition-parallel `find` pulls over
  * `_id` ranges — the reference's Mongo Query Replication
  * (flow/connectors/mongo/qrep.go:1-274 + qrep_partition.go: boundary
  * `_id` probes, uniform BigInt split of the ObjectID keyspace /
  * numeric split, `$gte/$lte` range filters, batchSize'd cursor
  * reads). Output schema is the reference's default
  * (GetDefaultSchema, qrep.go:193-212): `_id` as its canonical string
  * plus `_full_document` as compact JSON — downstream shaping is
  * declarative Spark over the JSON column.
  *
  * Mongo QRep is FULL-LOAD shaped: the watermark is `_id` and
  * resuming from a previous partition is unsupported in the reference
  * (qrep.go:37, "last partition is not supported") — rounds are full
  * refreshes, with `initial_copy_only` as the one-shot posture.
  *
  * `_id` types: ObjectID (12-byte BigInt keyspace, split uniformly —
  * the leading 4 timestamp bytes make this an insertion-time
  * partitioning), int32/int64 (numeric split), string ($sample-based
  * quantile boundaries — string keys are not uniform in the value
  * space, so the reference samples and splits by document share,
  * qrep_partition.go:151-232). Mixed or other types fall back to one
  * full-collection partition, like the reference.
  */
object LiveMongoPull {

  import Bson._
  import MongoWire.{field, int32Of, int64Of}

  private[graft] def sessionFor(ep: CaptureEndpoint): MongoSession = {
    val connectMs = ep.param("connect_timeout_ms", "10000").toInt
    val readMs = ep.param("read_timeout_ms", "60000").toInt
    val ssl = graft.cdc.Tls.fromParam(ep.param("ssl", ""),
      Some(ep.param("ssl_ca", "")))
    val dial: graft.cdc.Ssh.Dial = ep.params.get("ssh") match {
      case Some(spec) => graft.cdc.Ssh.tunnelDial(spec, readMs,
        keyFile = ep.params.get("ssh_key"),
        hostKeyPin = ep.params.get("ssh_host_key"))
      case None => graft.cdc.Ssh.tcpDial
    }
    new MongoSession(ep.host, ep.port, connectMs, readMs, ssl, dial,
      user = ep.user, password = ep.password,
      authSource = ep.param("auth_source", "admin")).connect()
  }

  /** (cursorId, docs) out of a find/getMore reply. */
  private def batchOf(reply: Array[Byte], key: String)
      : (Long, Seq[Array[Byte]]) = {
    val (_, cursor) = field(reply, "cursor").getOrElse(
      throw new java.io.IOException("mongo: reply without cursor"))
    val id = field(cursor, "id")
      .map { case (_, v) => int64Of(v) }.getOrElse(0L)
    val docs = field(cursor, key).map { case (_, arr) =>
      Bson.elements(arr).map(_._3)
    }.getOrElse(Nil)
    (id, docs)
  }

  /** An `_id` range bound, kept engine-portable for the closure. */
  private sealed trait Bound extends Serializable {
    def bval: BVal
  }
  private final case class OidBound(bytes: Array[Byte]) extends Bound {
    def bval: BVal = BObjectId(bytes)
  }
  private final case class NumBound(v: Long) extends Bound {
    def bval: BVal = BInt64(v)
  }
  private final case class StrBound(s: String) extends Bound {
    def bval: BVal = BString(s)
  }

  /** One `_id` range: `$gte lo` + (`$lte`|`$lt`) `hi`. ObjectID and
    * numeric splits chain disjoint inclusive bounds by integer
    * arithmetic; STRING quantile ranges chain half-open `[lo, hi)`
    * with an inclusive tail (sampled boundaries are real keys — an
    * inclusive end would pull them twice). (None, None) = full scan. */
  private final case class IdRange(lo: Option[Bound], hi: Option[Bound],
      hiInclusive: Boolean = true)

  // $sample posture from the reference (qrep_partition.go:19-25):
  // oversample so quantiles land well even with clustered keys; cap
  // the sampling cost on very large collections
  private val StringSampleOversample = 20
  private val StringSampleMaxSize = 100000

  /** Pre-sorted sample + real min/max → contiguous quantile ranges
    * `[min,b0) [b0,b1) … [bk,max]` — the reference's
    * computeStringBoundaries (qrep_partition.go:245-293), pure for
    * unit-testing. Returns fewer ranges when the sample yields too
    * few distinct interior boundaries. */
  private[qrep] def stringBoundaries(minVal: String, maxVal: String,
      samples: Seq[String], numPartitions: Int)
      : Seq[(String, String, Boolean)] = {
    val interior = samples.distinct
      .filter(s => s != minVal && s != maxVal)
    val desired = numPartitions - 1
    val picked =
      if (interior.size <= desired) interior
      else (1 to desired).map { i =>
        interior(math.min(interior.size - 1,
          i * interior.size / numPartitions))
      }.distinct
    val starts = minVal +: picked
    starts.zipWithIndex.map { case (s, i) =>
      if (i + 1 < starts.size) (s, starts(i + 1), false)
      else (s, maxVal, true)
    }
  }

  /** One round's full pull of `table` ("db.collection"), partitioned
    * by `_id` range. Eagerly localCheckpointed: by return, every
    * partition has read. */
  def pull(spark: SparkSession, url: String, table: String,
      numPartitions: Int = 4,
      rowsPerPartition: Option[Long] = None,
      /** Server-side cursor batch size for the partition reads (the
        * reference passes its rows-per-partition knob; capped by the
        * server at 16 MiB per batch anyway). */
      batchSize: Int = 4096): DataFrame = {
    val ep = CaptureEndpoint.parse(url)
    val (db, coll) = table.split("\\.", 2) match {
      case Array(d, c) => (d, c)
      case _ => (if (ep.database.nonEmpty) ep.database else "app", table)
    }

    val probe = sessionFor(ep)
    val ranges: Seq[IdRange] =
      try {
        val n = {
          val r = probe.call(Bson.encode(
            "count" -> BString(coll), "$db" -> BString(db)))
          field(r, "n").map {
            case (0x10, v) => int32Of(v).toLong
            case (0x12, v) => int64Of(v)
            case (0x01, v) =>
              java.lang.Double.longBitsToDouble(int64Of(v)).toLong
            case _ => 0L
          }.getOrElse(0L)
        }
        def boundary(dir: Int): Option[(Int, Array[Byte])] = {
          val r = probe.call(Bson.encode(
            "find" -> BString(coll),
            "sort" -> BDoc(Seq("_id" -> BInt32(dir))),
            "limit" -> BInt32(1),
            "projection" -> BDoc(Seq("_id" -> BInt32(1))),
            "$db" -> BString(db)))
          batchOf(r, "firstBatch")._2.headOption
            .flatMap(doc => field(doc, "_id"))
        }
        val bounds = (boundary(1), boundary(-1))

        val parts = math.max(1, math.min(rowsPerPartition match {
          case Some(rpp) =>
            math.min((n + rpp - 1) / math.max(1L, rpp), 4096L).toInt
          case None => numPartitions
        }, math.min(math.max(n, 1L), Int.MaxValue.toLong).toInt))

        // _id-typed range split; unsupported/mixed types → full scan
        val ranges: Seq[IdRange] = bounds match {
          case (Some((0x07, lo)), Some((0x07, hi))) if parts > 1 =>
            // ObjectID keyspace as a positive BigInt over the 12 bytes
            val (loI, hiI) = (BigInt(1, lo), BigInt(1, hi))
            val step = (hiI - loI + parts) / parts // ceil, ≥1 if hi>lo
            def toOid(v: BigInt): Array[Byte] = {
              val raw = v.toByteArray.dropWhile(_ == 0)
              require(raw.length <= 12, s"ObjectID overflow: $v")
              new Array[Byte](12 - raw.length) ++ raw
            }
            if (hiI == loI)
              Seq(IdRange(Some(OidBound(lo)), Some(OidBound(hi))))
            else (0 until parts).map { i =>
              val a = loI + step * i
              val b = if (i == parts - 1) hiI else (a + step - 1).min(hiI)
              IdRange(Some(OidBound(toOid(a))), Some(OidBound(toOid(b))))
            }.filter(r =>
              BigInt(1, r.lo.get.asInstanceOf[OidBound].bytes) <=
                BigInt(1, r.hi.get.asInstanceOf[OidBound].bytes))
          case (Some((tLo, lo)), Some((tHi, hi)))
              if (tLo == 0x10 || tLo == 0x12) &&
                (tHi == 0x10 || tHi == 0x12) && parts > 1 =>
            def longOf(t: Int, v: Array[Byte]): Long =
              if (t == 0x10) int32Of(v).toLong else int64Of(v)
            // Half-open ranges [a, nextA) with only the final range
            // end-inclusive at max: Mongo compares ALL numeric types by
            // value, so a collection whose min/max decode as int32/int64
            // can still hold fractional double/decimal _ids — inclusive
            // integer chains [a,b] [b+1,…] would silently drop every _id
            // in the open gap (b, b+1). The reference's numericPartitions
            // emits [start, end) for exactly this reason
            // (mongo/qrep_partition.go:128-131).
            val rs = LivePgPull.uniformRanges(longOf(tLo, lo),
              longOf(tHi, hi), parts)
            rs.zipWithIndex.map { case ((a, b), i) =>
              if (i == rs.size - 1)
                IdRange(Some(NumBound(a)), Some(NumBound(b)))
              else
                IdRange(Some(NumBound(a)), Some(NumBound(rs(i + 1)._1)),
                  hiInclusive = false)
            }
          case (Some((0x02, lo)), Some((0x02, hi))) if parts > 1 =>
            // STRING _id keyspace: package-name-style keys are NOT
            // uniform, so the reference samples the collection and
            // takes quantile boundaries (qrep_partition.go:151-232);
            // $sample below ~5% of the collection rides WiredTiger's
            // random cursor — cheap even on large collections
            val (minS, maxS) = (MongoWire.stringOf(lo),
              MongoWire.stringOf(hi))
            if (minS >= maxS) Seq(IdRange(None, None))
            else {
              val size = math.min(
                parts.toLong * StringSampleOversample,
                StringSampleMaxSize.toLong).toInt
              val first = probe.call(Bson.encode(
                "aggregate" -> BString(coll),
                "pipeline" -> BArray(Seq(
                  BDoc(Seq("$sample" ->
                    BDoc(Seq("size" -> BInt32(size))))),
                  BDoc(Seq("$project" ->
                    BDoc(Seq("_id" -> BInt32(1))))),
                  BDoc(Seq("$sort" -> BDoc(Seq("_id" -> BInt32(1))))))),
                "cursor" -> BDoc(Nil),
                "$db" -> BString(db)))
              val samples = scala.collection.mutable.Buffer.empty[String]
              var (cid, docs) = batchOf(first, "firstBatch")
              var draining = true
              while (draining) {
                docs.foreach { d =>
                  field(d, "_id").foreach {
                    case (0x02, v) => samples += MongoWire.stringOf(v)
                    case _ => ()
                  }
                }
                if (cid == 0L) draining = false
                else {
                  val r = probe.call(Bson.encode(
                    "getMore" -> BInt64(cid),
                    "collection" -> BString(coll),
                    "$db" -> BString(db)))
                  val (nid, nd) = batchOf(r, "nextBatch")
                  cid = nid; docs = nd
                  if (nd.isEmpty && cid == 0L) draining = false
                }
              }
              val qs = stringBoundaries(minS, maxS, samples.toSeq, parts)
              if (qs.size < 2) Seq(IdRange(None, None)) // too few
              else qs.map { case (s, e, incl) =>
                IdRange(Some(StrBound(s)), Some(StrBound(e)), incl)
              }
            }
          case (Some(_), Some(_)) => Seq(IdRange(None, None))
          case _ => Nil // empty collection
        }
        ranges
      } finally probe.close()

    val spark0 = spark
    if (ranges.isEmpty)
      return spark0.emptyDataset(
        Encoders.tuple(Encoders.STRING, Encoders.STRING))
        .toDF("_id", "_full_document")

    val urlSer = url
    val (dbSer, collSer, batchSer) = (db, coll, batchSize)
    val tuples = spark.createDataset(
      spark.sparkContext.parallelize(ranges, ranges.size)
        .mapPartitions { it =>
          it.flatMap { r =>
            val sess = sessionFor(CaptureEndpoint.parse(urlSer))
            val tc = org.apache.spark.TaskContext.get()
            if (tc != null)
              tc.addTaskCompletionListener[Unit](_ => sess.close())
            try {
              val filter = (r.lo, r.hi) match {
                case (Some(a), Some(b)) => BDoc(Seq("_id" -> BDoc(Seq(
                  "$gte" -> a.bval,
                  (if (r.hiInclusive) "$lte" else "$lt") -> b.bval))))
                case _ => BDoc(Nil)
              }
              val first = sess.call(Bson.encode(
                "find" -> BString(collSer),
                "filter" -> filter,
                "batchSize" -> BInt32(batchSer),
                "$db" -> BString(dbSer)))
              var (cid, docs) = batchOf(first, "firstBatch")
              // stream batch-at-a-time off the cursor: per-task
              // memory is O(batch), and the connection closes as
              // soon as this range's docs are exhausted
              new Iterator[(String, String)] {
                private var queue = docs.iterator
                private var done = false
                private def refill(): Unit =
                  while (!done && !queue.hasNext) {
                    if (cid == 0L) {
                      done = true
                      sess.close()
                    } else {
                      val r = sess.call(Bson.encode(
                        "getMore" -> BInt64(cid),
                        "collection" -> BString(collSer),
                        "$db" -> BString(dbSer)))
                      val (nid, nd) = batchOf(r, "nextBatch")
                      cid = nid
                      if (nd.isEmpty && cid == 0L) {
                        done = true
                        sess.close()
                      } else queue = nd.iterator
                    }
                  }
                override def hasNext: Boolean = { refill(); !done }
                override def next(): (String, String) = {
                  refill()
                  val d = queue.next()
                  val idStr = field(d, "_id")
                    .map { case (t, v) => Bson.idToString(t, v) }
                    .getOrElse(throw new java.io.IOException(
                      "mongo: document without _id"))
                  (idStr, Bson.documentToJson(d))
                }
              }
            } catch { case e: Throwable => sess.close(); throw e }
          }
        })(Encoders.tuple(Encoders.STRING, Encoders.STRING))
    tuples.toDF("_id", "_full_document").localCheckpoint()
  }
}
