package graft.qrep

import java.net.ServerSocket
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import graft.cdc.{Bson, MongoWire, WireServers}
import graft.mirror.GraftSql

/** LIVE Mongo QRep over OP_MSG ([[LiveMongoPull]]) against a fixture
  * server (no mongod in this environment; the change-stream half of
  * MongoWire is pinned separately). Mirrors the reference's Mongo
  * Query Replication (flow/connectors/mongo/qrep.go +
  * qrep_partition.go): boundary `_id` probes, uniform ObjectID /
  * numeric keyspace split, `$gte/$lte` find filters, batchSize'd
  * getMore cursor loops, `_id` + `_full_document` output schema. */
class LiveMongoQRepSpec extends SparkSpec {

  import Bson._

  private def run(sql: String) = GraftSql.execute(spark,
    GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))

  /** 12-byte ObjectID from a BigInt (big-endian, left-padded). */
  private def oid(v: BigInt): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    new Array[Byte](12 - raw.length) ++ raw
  }

  /** Fixture state + handler over an in-memory doc list. Supports
    * count / boundary find (sort+limit) / range find / getMore. */
  private final class Fixture(docs: () => Seq[BDoc],
      idOf: BDoc => BigInt) {
    val cursors = new ConcurrentHashMap[Long, Iterator[Seq[BDoc]]]()
    val nextCid = new AtomicLong(1)
    @volatile var findCalls = 0
    @volatile var getMoreCalls = 0
    /** Every range filter served: (hi operator, lo, hi) — the probe
      * for asserting half-open vs inclusive range emission. */
    val seenRanges =
      new java.util.concurrent.ConcurrentLinkedQueue[
        (String, BigInt, BigInt)]()

    def handle(cmd: String, doc: Array[Byte]): Array[Byte] = {
      import MongoWire.{field, int32Of, int64Of}
      def cursorReply(key: String, cid: Long,
          batch: Seq[BDoc]): Array[Byte] =
        Bson.encode(
          "cursor" -> BDoc(Seq("id" -> BInt64(cid),
            key -> BArray(batch))),
          "ok" -> BDouble(1.0))
      cmd match {
        case "count" => Bson.encode(
          "n" -> BInt32(docs().size), "ok" -> BDouble(1.0))
        case "find" =>
          findCalls += 1
          field(doc, "sort") match {
            case Some((_, sortDoc)) => // boundary probe, limit 1
              val dir = field(sortDoc, "_id")
                .map { case (_, v) => int32Of(v) }.getOrElse(1)
              val d = docs()
              val pick =
                if (d.isEmpty) Nil
                else if (dir >= 0) Seq(d.minBy(idOf))
                else Seq(d.maxBy(idOf))
              cursorReply("firstBatch", 0L, pick)
            case None =>
              val selected = field(doc, "filter")
                .flatMap { case (_, f) => field(f, "_id") }
                match {
                  case Some((_, idRange)) =>
                    def boundVal(k: String): Option[BigInt] =
                      field(idRange, k).map {
                        case (0x07, v) => BigInt(1, v)
                        case (0x12, v) => BigInt(int64Of(v))
                        case (0x10, v) => BigInt(int32Of(v))
                        case other => fail(s"unexpected bound $other")
                      }
                    // half-open ($lt) and inclusive ($lte) ends both
                    // serve — mongo compares numerics by value, and
                    // the engine emits [lo, nextLo) chains with an
                    // inclusive final range
                    val lo = boundVal("$gte").get
                    val hiIncl = boundVal("$lte")
                    val hiExcl = boundVal("$lt")
                    seenRanges.add((
                      if (hiExcl.isDefined) "$lt" else "$lte",
                      lo, hiExcl.orElse(hiIncl).get))
                    docs().filter { d =>
                      val id = idOf(d)
                      id >= lo && hiIncl.forall(id <= _) &&
                        hiExcl.forall(id < _)
                    }
                  case None => docs()
                }
              val batchSize = field(doc, "batchSize")
                .map { case (_, v) => int32Of(v) }.getOrElse(101)
              val batches = selected.grouped(batchSize).toSeq
              if (batches.size <= 1)
                cursorReply("firstBatch", 0L, batches.flatten)
              else {
                val cid = nextCid.getAndIncrement()
                cursors.put(cid, batches.tail.iterator)
                cursorReply("firstBatch", cid, batches.head)
              }
          }
        case "getMore" =>
          getMoreCalls += 1
          val cid = Bson.elements(doc).headOption
            .map { case (_, _, v) => int64Of(v) }.getOrElse(0L)
          val it = cursors.get(cid)
          if (it == null || !it.hasNext) {
            cursors.remove(cid)
            cursorReply("nextBatch", 0L, Nil)
          } else {
            val batch = it.next()
            val more = it.hasNext
            if (!more) cursors.remove(cid)
            cursorReply("nextBatch", if (more) cid else 0L, batch)
          }
        case other => Bson.encode("ok" -> BDouble(0.0),
          "errmsg" -> BString(s"unsupported fixture command $other"))
      }
    }
  }

  test("ObjectID keyspace: boundary probe + uniform BigInt split, " +
    "batchSize'd getMore cursors, _id/_full_document output — " +
    "1000 docs exactly once across 4 balanced ranges") {
    val base = BigInt("65f000000000000000000000", 16)
    val docs: Seq[BDoc] = (0 until 1000).map { i =>
      BDoc(Seq("_id" -> BObjectId(oid(base + i)),
        "k" -> BInt32(i), "txt" -> BString(s"d$i")))
    }
    val fx = new Fixture(() => docs,
      d => BigInt(1, d.fields.head._2.asInstanceOf[BObjectId].bytes))
    val listener = new ServerSocket(0)
    WireServers.serveMongoQuery(listener, fx.handle)
    try {
      val url = s"mongo://127.0.0.1:${listener.getLocalPort}/appdb"
      val df = LiveMongoPull.pull(spark, url, "appdb.events",
        rowsPerPartition = Some(250L), batchSize = 100)
      assert(df.columns.toSeq == Seq("_id", "_full_document"))
      assert(df.count() == 1000)
      assert(df.select("_id").distinct().count() == 1000)
      // hex ObjectID strings
      assert(df.head.getString(0).matches("[0-9a-f]{24}"))
      // the full document is valid JSON with the payload intact
      val ks = df.selectExpr(
        "CAST(get_json_object(_full_document, '$.k') AS BIGINT) AS k")
        .agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
      assert(ks == 999L * 1000 / 2)
      // 4 ranges from the rows knob; sequential ids → balanced
      val sizes = df.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().map(_._2)
      assert(sizes.length == 4 && sizes.sum == 1000)
      assert(sizes.max <= 2 * sizes.min,
        s"unbalanced: ${sizes.mkString(",")}")
      // 100-doc server batches actually exercised the cursor loop
      assert(fx.getMoreCalls > 0)
    } finally listener.close()
  }

  test("stringBoundaries: quantile ranges cover [min, max] exactly " +
    "once — half-open chain, inclusive tail, dedup'd interior, " +
    "boundary-equal samples dropped (zero-width partitions)") {
    val bs = LiveMongoPull.stringBoundaries("aaa", "zzz",
      Seq("aaa", "ddd", "ddd", "mmm", "qqq", "zzz"), 4)
    assert(bs == Seq(("aaa", "ddd", false), ("ddd", "mmm", false),
      ("mmm", "qqq", false), ("qqq", "zzz", true)))
    // too few distinct interior samples → fewer ranges, still covering
    val few = LiveMongoPull.stringBoundaries("aaa", "zzz",
      Seq("mmm"), 8)
    assert(few == Seq(("aaa", "mmm", false), ("mmm", "zzz", true)))
    // oversampled: evenly spaced quantiles, chained ends
    val many = LiveMongoPull.stringBoundaries("a", "z",
      (1 to 80).map(i => f"k$i%02d"), 4)
    assert(many.size == 4)
    assert(many.head._1 == "a" && many.last._2 == "z" && many.last._3)
    assert(many.sliding(2).forall {
      case Seq(x, y) => x._2 == y._1
      case _ => true
    })
  }

  test("STRING _id keyspace: $sample quantile partitioning balances " +
    "clustered keys where a uniform value split could not; every doc " +
    "arrives exactly once across half-open ranges + inclusive tail") {
    // clustered keys: 800 docs under 'pkg-a/...', 200 under 'zlib/...'
    val ids = ((0 until 800).map(i => f"pkg-a/mod-$i%04d") ++
      (0 until 200).map(i => f"zlib/v$i%03d")).sorted
    val docs: Seq[BDoc] = ids.zipWithIndex.map { case (id, i) =>
      BDoc(Seq("_id" -> BString(id), "k" -> BInt32(i)))
    }
    val listener = new ServerSocket(0)
    // fixture: count / boundary find / $sample aggregate / range find
    WireServers.serveMongoQuery(listener, { (cmd, doc) =>
      import MongoWire.{field, int32Of}
      def reply(batch: Seq[BDoc]): Array[Byte] = Bson.encode(
        "cursor" -> BDoc(Seq("id" -> BInt64(0L),
          "firstBatch" -> BArray(batch))),
        "ok" -> BDouble(1.0))
      cmd match {
        case "count" => Bson.encode(
          "n" -> BInt32(docs.size), "ok" -> BDouble(1.0))
        case "aggregate" =>
          // deterministic "sample": every 10th doc, pre-sorted (the
          // server sorts via the $sort stage)
          val size = 100
          val sampled = ids.grouped(ids.size / size).map(_.head)
            .toSeq.sorted.map(id => BDoc(Seq("_id" -> BString(id))))
          reply(sampled)
        case "find" =>
          field(doc, "sort") match {
            case Some((_, sortDoc)) =>
              val dir = field(sortDoc, "_id")
                .map { case (_, v) => int32Of(v) }.getOrElse(1)
              reply(Seq(
                if (dir >= 0) docs.head else docs.last))
            case None =>
              val sel = field(doc, "filter")
                .flatMap { case (_, f) => field(f, "_id") } match {
                case Some((_, idRange)) =>
                  def s(k: String): Option[String] =
                    field(idRange, k).map { case (_, v) =>
                      MongoWire.stringOf(v) }
                  def idStr(d: BDoc): String =
                    d.fields.head._2.asInstanceOf[BString].v
                  val lo = s("$gte").get
                  (s("$lte"), s("$lt")) match {
                    case (Some(hi), _) =>
                      docs.filter(d =>
                        idStr(d) >= lo && idStr(d) <= hi)
                    case (_, Some(hi)) =>
                      docs.filter(d =>
                        idStr(d) >= lo && idStr(d) < hi)
                    case _ => fail("range filter without upper bound")
                  }
                case None => docs
              }
              reply(sel)
          }
        case other => Bson.encode("ok" -> BDouble(0.0),
          "errmsg" -> BString(s"unsupported fixture command $other"))
      }
    })
    try {
      val url = s"mongo://127.0.0.1:${listener.getLocalPort}/appdb"
      val df = LiveMongoPull.pull(spark, url, "appdb.packages",
        numPartitions = 5)
      assert(df.count() == 1000)
      assert(df.select("_id").distinct().count() == 1000)
      assert(df.rdd.getNumPartitions == 5)
      val sizes = df.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().map(_._2)
      assert(sizes.sum == 1000)
      // quantile boundaries → roughly equal document shares (the
      // uniform VALUE split would depend on the key text instead)
      assert(sizes.max <= 2 * sizes.min,
        s"quantile split unbalanced: ${sizes.mkString(",")}")
    } finally listener.close()
  }

  test("numeric _id keyspace splits through the int64 branch") {
    val docs: Seq[BDoc] = (0 until 300).map { i =>
      BDoc(Seq("_id" -> BInt64(1000L + i), "v" -> BString(s"n$i")))
    }
    val fx = new Fixture(() => docs,
      d => BigInt(d.fields.head._2.asInstanceOf[BInt64].v))
    val listener = new ServerSocket(0)
    WireServers.serveMongoQuery(listener, fx.handle)
    try {
      val url = s"mongo://127.0.0.1:${listener.getLocalPort}/appdb"
      val df = LiveMongoPull.pull(spark, url, "appdb.nums",
        numPartitions = 3)
      assert(df.count() == 300)
      assert(df.select("_id").distinct().count() == 300)
      assert(df.rdd.getNumPartitions == 3)
      // HALF-OPEN ranges (mongo/qrep_partition.go:128-131): mongo
      // compares all numeric types by value, so a fractional double
      // _id in the open gap (b, b+1) of inclusive integer chains
      // would be dropped silently. Every non-final range must be
      // [lo, nextLo) with the final range inclusive at max.
      import scala.jdk.CollectionConverters._
      val ranges = fx.seenRanges.asScala.toSeq.sortBy(_._2)
      assert(ranges.size == 3)
      ranges.init.zip(ranges.tail).foreach { case (a, b) =>
        assert(a._1 == "$lt", s"non-final range must be half-open: $a")
        assert(a._3 == b._2,
          s"ranges must tile with no gap: $a then $b")
      }
      assert(ranges.last._1 == "$lte" &&
        ranges.last._3 == BigInt(1299),
        s"final range must be end-inclusive at max: ${ranges.last}")
    } finally listener.close()
  }

  test("DDL surface: a mongo:// QRep peer full-loads through EXECUTE; " +
    "initial_copy_only makes the load one-shot (re-EXECUTE no-ops)") {
    val base = BigInt("660000000000000000000000", 16)
    val docs: Seq[BDoc] = (0 until 500).map { i =>
      BDoc(Seq("_id" -> BObjectId(oid(base + i)),
        "name" -> BString(s"user$i")))
    }
    val fx = new Fixture(() => docs,
      d => BigInt(1, d.fields.head._2.asInstanceOf[BObjectId].bytes))
    val listener = new ServerSocket(0)
    WireServers.serveMongoQuery(listener, fx.handle)
    try {
      val dir = tmpDir("livemongoddl")
      run(s"CREATE PEER mgsrc TYPE mongo OPTIONS (" +
        s"url 'mongo://127.0.0.1:${listener.getLocalPort}/appdb')")
      run(s"CREATE PEER mgdst TYPE parquet OPTIONS (dir '$dir/dst')")
      run("CREATE MIRROR mg1 FROM mgsrc TO mgdst FOR " +
        "$$ full $$ " + // not SQL against a document store: ignored
        "WITH (watermark_column '_id', source_table 'appdb.users', " +
        s"dest_dir '$dir/dest', num_rows_per_partition '100', " +
        "initial_copy_only 'true')")
      assert(run("EXECUTE MIRROR mg1").head.getLong(0) == 500L)
      assert(run("EXECUTE MIRROR mg1").head.getLong(0) == 0L) // done
      val out = spark.read.parquet(s"$dir/dest")
      assert(out.count() == 500)
      assert(out.selectExpr(
        "get_json_object(_full_document, '$.name') AS n")
        .where("n = 'user7'").count() == 1)
      run("DROP MIRROR mg1"); run("DROP PEER mgsrc")
      run("DROP PEER mgdst")
    } finally listener.close()
  }

  test("mongo QRep is full-load shaped: mode append/upsert is rejected " +
    "at DDL time (the pull has no increment to feed them)") {
    val dir = tmpDir("livemongomode")
    run(s"CREATE PEER mmsrc TYPE mongo OPTIONS (" +
      "url 'mongo://127.0.0.1:1/appdb')") // never dialed: DDL-time fail
    run(s"CREATE PEER mmdst TYPE parquet OPTIONS (dir '$dir/dst')")
    val e = intercept[IllegalArgumentException] {
      run("CREATE MIRROR mgbad FROM mmsrc TO mmdst FOR $$ full $$ " +
        "WITH (watermark_column '_id', source_table 'appdb.users', " +
        s"dest_dir '$dir/dest', mode 'append')")
    }
    assert(e.getMessage.contains("full-load"))
    intercept[IllegalArgumentException] {
      run("CREATE MIRROR mgbad2 FROM mmsrc TO mmdst FOR $$ full $$ " +
        "WITH (watermark_column '_id', source_table 'appdb.users', " +
        s"dest_dir '$dir/dest', mode 'upsert', unique_key '_id')")
    }
    run("DROP PEER mmsrc"); run("DROP PEER mmdst")
  }

  test("dest_url on a mongo QRep mirror loads the LIVE SQL destination " +
    "(atomic full refresh) instead of silently writing parquet only") {
    val pg = graft.cdc.StockPostgres.start()
    assume(pg.isDefined, "stock postgres unavailable in this env")
    val s = pg.get
    val base = BigInt("661000000000000000000000", 16)
    @volatile var docs: Seq[BDoc] = (0 until 400).map { i =>
      BDoc(Seq("_id" -> BObjectId(oid(base + i)),
        "name" -> BString(s"user$i")))
    }
    val fx = new Fixture(() => docs,
      d => BigInt(1, d.fields.head._2.asInstanceOf[BObjectId].bytes))
    val listener = new ServerSocket(0)
    WireServers.serveMongoQuery(listener, fx.handle)
    try {
      s.psql("CREATE DATABASE mongodest")
      val dir = tmpDir("livemongodst")
      run(s"CREATE PEER mdsrc TYPE mongo OPTIONS (" +
        s"url 'mongo://127.0.0.1:${listener.getLocalPort}/appdb')")
      run(s"CREATE PEER mddst TYPE postgres OPTIONS (" +
        s"url 'pg://postgres@127.0.0.1:${s.port}/mongodest')")
      run("CREATE MIRROR mgd FROM mdsrc TO mddst FOR $$ full $$ " +
        "WITH (watermark_column '_id', source_table 'appdb.users', " +
        s"dest_dir '$dir/dest', num_partitions '3', " +
        s"dest_url 'pg://postgres@127.0.0.1:${s.port}/mongodest', " +
        "dest_table 'public.users_mirror')")
      assert(run("EXECUTE MIRROR mgd").head.getLong(0) == 400L)
      assert(s.psql("SELECT count(*) FROM public.users_mirror",
        db = "mongodest").trim == "400")
      assert(s.psql("SELECT count(*) FROM public.users_mirror " +
        "WHERE _full_document::jsonb->>'name' = 'user7'",
        db = "mongodest").trim == "1")

      // full-refresh semantics reach the live destination: a shrunken
      // source replaces, not appends
      docs = docs.take(250)
      assert(run("EXECUTE MIRROR mgd").head.getLong(0) == 250L)
      assert(s.psql("SELECT count(*) FROM public.users_mirror",
        db = "mongodest").trim == "250")

      run("DROP MIRROR mgd"); run("DROP PEER mdsrc")
      run("DROP PEER mddst")
    } finally { listener.close(); s.stop() }
  }
}
