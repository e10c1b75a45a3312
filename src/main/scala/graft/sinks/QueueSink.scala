package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Queue-destination record shaping — the Kafka/PubSub/EventHubs sink path
  * (flow/connectors/kafka/kafka.go:295-420, lvalueToKafkaRecord:173-224).
  *
  * The reference runs a Lua script per record to pick topic/key/payload;
  * here the routing is a column-expression hook (codegen'd, no per-record
  * interpreter). The output frame has exactly the schema
  * `writeStream.format("kafka")` consumes: (topic, key, value, headers);
  * publishing is `.writeStream.format("kafka")` in a deployment with the
  * connector on the classpath — the shaping below is the engine-owned part.
  */
object QueueSink {

  /** Default routing (script absent, kafka.go:301-312): topic = destination
    * table, key = uid, value = the change row as JSON. */
  def defaultRecords(raw: DataFrame): DataFrame =
    records(raw,
      topic = col(graft.model.RawTable.DestinationTable),
      key = col(graft.model.RawTable.Uid),
      value = to_json(struct(raw.columns.map(col): _*)))

  /** Custom routing hook (the Lua-script parity point). */
  def records(df: DataFrame, topic: Column, key: Column, value: Column,
      headers: Map[String, Column] = Map.empty): DataFrame = {
    val headerCol =
      if (headers.isEmpty) lit(null).cast("array<struct<key:string,value:binary>>")
      else array(headers.toSeq.sortBy(_._1).map { case (k, v) =>
        struct(lit(k).as("key"), v.cast("binary").as("value"))
      }: _*)
    df.select(topic.cast("string").as("topic"), key.cast("string").as("key"),
      value.cast("string").as("value"), headerCol.as("headers"))
  }

  /** FNV-1a 32-bit of a string — the EventHubs partition hash
    * (flow/connectors/eventhub/partition_hash.go:16) over the string's
    * UTF-8 bytes via the codegen'd [[graft.functions.Fnv1a32Expr]]
    * (a built-in `aggregate` fold would run interpreted — higher-order
    * functions have no codegen). NULL hashes like the empty string,
    * exactly the `partitionValue == nil` branch
    * (eventhub.go:283-289). */
  def fnv1a32(s: Column): Column =
    graft.functions.SignatureExprs.fnv1a32(
      coalesce(s.cast("string"), lit("")))

  /** EventHubs routing (flow/connectors/eventhub/eventhub.go:270-299,
    * scoped_eventhub.go): a destination `namespace.hub.partition_column`
    * sends each record to hub partition
    * `fnv1a32(string(column value)) % partitionCount` rendered as a
    * decimal string, and events batch per (namespace, hub, partition)
    * with at most `maxPerBatch` events per EventDataBatch
    * (hub_batches.go flush bound) — `batch_seq` numbers those batches
    * in `order` within each scope. One window shuffle on the scope key,
    * everything else codegen'd column work. */
  def eventHubsRecords(df: DataFrame, namespace: Column, hub: Column,
      partitionValue: Column, value: Column,
      partitionCount: Int, maxPerBatch: Int, order: Column): DataFrame = {
    require(partitionCount > 0 && maxPerBatch > 0,
      "partitionCount and maxPerBatch must be positive")
    val pk = pmod(fnv1a32(partitionValue), lit(partitionCount.toLong))
      .cast("string")
    df.select(namespace.cast("string").as("namespace"),
        hub.cast("string").as("hub"), pk.as("partition_key"),
        value.cast("string").as("value"), order.as("__ord"))
      .withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("namespace", "hub", "partition_key")
            .orderBy("__ord")))
      .withColumn("batch_seq",
        expr(s"CAST((__rn - 1) DIV $maxPerBatch AS BIGINT)"))
      .select("namespace", "hub", "partition_key", "batch_seq", "value")
  }

  /** PubSub routing (flow/connectors/pubsub/pubsub.go:110-200):
    * (topic, ordering_key, value), with `ordered` = the per-message
    * flag that flips the publisher's EnableMessageOrdering exactly when
    * the reference does (a non-empty ordering key, pubsub.go:197-199);
    * a NULL key publishes unordered like an absent Lua key. */
  def pubSubRecords(df: DataFrame, topic: Column, orderingKey: Column,
      value: Column): DataFrame =
    df.select(topic.cast("string").as("topic"),
        coalesce(orderingKey.cast("string"), lit(""))
          .as("ordering_key"),
        value.cast("string").as("value"))
      .withColumn("ordered", col("ordering_key") =!= "")
}

/** The ONE routing for a lua-shaped queue frame — (topic, key, value,
  * headers, partition, __ord), [[graft.transform.LuaQueue]]'s output —
  * to a queue url. Shared by the CDC mirror's `queue_url` leg and the
  * QRep `dest_url` leg so the kafka param parsing, the pubsub
  * ordering-key projection, and the eventhubs shaping can never
  * diverge between them. */
object ShapedQueue {

  val KafkaUrl = "^kafka://([^:/?]+):(\\d+)(?:\\?(.*))?$".r
  val EsUrl = "^es://([^:/?]+):(\\d+)/?$".r
  // shape-only owners for the two path-carrying schemes (project /
  // namespace ride the path) — DDL validation and runtime routing
  // read the SAME patterns so they cannot drift
  val PubSubUrl = "^pubsub://[^:/?]+:\\d+/[^/?]+(\\?.*)?$".r
  val EventHubsUrl = "^eventhubs://[^:/?]+:\\d+/[^/?]+(\\?.*)?$".r

  /** PEERDB_QUEUE_FORCE_TOPIC_CREATION resolution: the per-url
    * `force_topic_creation` param wins over the declared setting
    * (`spark.graft.queue.force_topic_creation`), default false. */
  def forceTopicCreationOf(params: Map[String, String],
      spark: org.apache.spark.sql.SparkSession,
      env: Map[String, String] = Map.empty): Boolean =
    params.get("force_topic_creation").map(_.toBoolean).getOrElse(
      graft.mirror.Settings.get(spark, "queue.force_topic_creation",
        env).exists(_.toBoolean))

  /** kgo.ManualPartitioner's precondition (kafka.go:106-107), shared
    * by the shaped and default kafka legs: only an explicit script
    * can assign partitions. Returns the manual flag. */
  def requireManualHasScript(params: Map[String, String],
      scriptAssigns: Boolean): Boolean = {
    val manual = params.get("partitioner")
      .exists(_.equalsIgnoreCase("manual"))
    if (manual && !scriptAssigns)
      throw new IllegalArgumentException(
        "kafka: partitioner=manual needs a script that assigns " +
          "partitions (script_lang 'lua')")
    manual
  }

  def kafkaParams(q: String): Map[String, String] =
    Option(q).getOrElse("").split("&").iterator
      .map(_.trim).filter(_.nonEmpty).map { e =>
        e.split("=", 2) match {
          case Array(k, v) =>
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          case Array(k) => k -> ""
        }
      }.toMap

  /** Publish a shaped frame. `scriptAssignsPartitions` gates kafka's
    * `partitioner=manual` (kgo.ManualPartitioner, kafka.go:106-107):
    * only an explicit lua script can assign partitions — the
    * DefaultOnRecord JSON image never does, so manual routing with it
    * would silently send everything to partition 0. */
  def publish(shaped: DataFrame, url: String,
      scriptAssignsPartitions: Boolean,
      /** per-flow setting overrides (dynLookup env-first order) */
      env: Map[String, String] = Map.empty): Long = url match {
    case KafkaUrl(h, p, q) =>
      val params = kafkaParams(q)
      val manual =
        requireManualHasScript(params, scriptAssignsPartitions)
      KafkaPublish.publish(
        shaped.select("topic", "key", "value", "headers", "partition"),
        h, p.toInt,
        acks = params.get("acks").map(_.toInt).getOrElse(-1),
        // ssh=user:pass@bastion[:port] — the destination socket
        // rides the same tunnel stack as the capture sources
        sshSpec = params.get("ssh"),
        manualPartitions = manual,
        forceTopicCreation =
          forceTopicCreationOf(params, shaped.sparkSession, env))
    case u if u.startsWith("pubsub://") =>
      // per-key ordered publish (pubsub.go:110-125): a script `key`
      // is the ordering key; absent publishes unordered
      PubSubSink.publish(shaped.select(
        col("topic"),
        coalesce(col("key"), lit("")).as("ordering_key"),
        col("value"),
        (coalesce(col("key"), lit("")) =!= "").as("ordered"),
        col("__ord")), u)
    case u if u.startsWith("eventhubs://") =>
      // eventhub.go:191-296 lvalueToEventData: `topic` is the hub,
      // `key` the partition key (absent falls back to the order key —
      // stable routing), strict UTF-8 on the REST JSON body
      val ep = graft.cdc.CaptureEndpoint.parse(u)
      val ns = if (ep.database.nonEmpty) ep.database else "ns"
      EventHubsSink.publish(
        EventHubsSink.records(shaped,
          namespace = lit(ns),
          hub = col("topic"),
          partitionValue = coalesce(col("key"), col("__ord")),
          value = EventHubsSink.utf8StrictValue(col("value")),
          partitionCount = ep.param("partition_count", "4").toInt,
          maxPerBatch = ep.param("max_per_batch", "500").toInt,
          order = col("__ord")), u)
    case other => throw new IllegalArgumentException(
      s"unsupported queue url for a shaped publish: $other")
  }
}

/** Live Google Pub/Sub destination over the public REST publish API
  * (the documented HTTP surface of flow/connectors/pubsub/pubsub.go,
  * which speaks the same service through the Go client):
  * `POST /v1/projects/{project}/topics/{topic}:publish` with
  * `{"messages":[{"data":"<base64>","orderingKey":"…"}]}` and a
  * bearer token. Ordering contract (pubsub.go:197-199 +
  * EnableMessageOrdering): messages sharing a non-empty ordering key
  * must publish in order — rows hash-partition BY the ordering key
  * and sort within each partition, so one key's messages ride one
  * sequential connection while distinct keys publish in parallel
  * across partitions (exactly the service's per-key guarantee, and
  * the same fan-out shape as the Kafka/ES sinks). */
object PubSubSink {

  /** Default mirror routing — the no-script DefaultOnRecord shape the
    * Kafka default shares (kafka.go:301-312): topic = destination
    * table, ordering key = uid, payload = the change row as JSON. */
  def defaultRecords(raw: DataFrame): DataFrame =
    QueueSink.pubSubRecords(raw,
      topic = col(graft.model.RawTable.DestinationTable),
      orderingKey = col(graft.model.RawTable.Uid),
      value = to_json(struct(raw.columns.map(col): _*)))
      // the ordering key IS the zero-padded LSN: lexicographic = WAL
      // order, so it doubles as the per-key publish order
      .withColumn("__ord", col("ordering_key"))

  /** Publish a shaped frame (topic, ordering_key, value, ordered,
    * __ord). `url`: `pubsub://host:port/project[?token=…&tls=true&
    * messages_per_publish=N]` — the real service is
    * `pubsub.googleapis.com:443` with `tls=true`; fixtures bind
    * plain HTTP. Returns messages published; any non-200 or a
    * response acking fewer ids than sent fails the batch loudly. */
  def publish(shaped: DataFrame, url: String): Long = {
    val ep = graft.cdc.CaptureEndpoint.parse(url)
    require(ep.scheme == "pubsub", s"pubsub:// url expected, got '$url'")
    val project =
      if (ep.database.nonEmpty) ep.database
      else throw new IllegalArgumentException(
        s"pubsub url must carry the project as its path: '$url'")
    val scheme = if (ep.param("tls", "false") == "true") "https"
      else "http"
    val base = s"$scheme://${ep.host}:${ep.port}"
    val token = ep.params.get("token")
    val perPublish = ep.param("messages_per_publish", "100").toInt
    val connectMs = ep.param("connect_timeout_ms", "5000").toInt
    val readMs = ep.param("read_timeout_ms", "30000").toInt
    val counter = shaped.sparkSession.sparkContext
      .longAccumulator("pubsub_published")
    // per-key ordering: same key → same partition, WAL order within.
    // UNORDERED messages (empty key) spread by their own __ord instead
    // — hashing them all onto the '' key would funnel every unordered
    // record of a batch through ONE partition.
    shaped.repartition(
        when(col("ordered"), col("ordering_key"))
          .otherwise(concat(lit("\u0000unordered:"), col("__ord"))))
      .sortWithinPartitions(col("ordering_key"), col("__ord"))
      .select("topic", "ordering_key", "value", "ordered")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        def post(topic: String, messages: Seq[String]): Unit = {
          val body = s"""{"messages":[${messages.mkString(",")}]}"""
          val conn = new java.net.URL(
            s"$base/v1/projects/$project/topics/$topic:publish")
            .openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setConnectTimeout(connectMs)
          conn.setReadTimeout(readMs)
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/json")
          token.foreach(t =>
            conn.setRequestProperty("Authorization", s"Bearer $t"))
          val bytes = body.getBytes(
            java.nio.charset.StandardCharsets.UTF_8)
          conn.setFixedLengthStreamingMode(bytes.length)
          val out = conn.getOutputStream
          try out.write(bytes) finally out.close()
          val code = conn.getResponseCode
          val in = if (code >= 400) conn.getErrorStream
            else conn.getInputStream
          val resp = if (in == null) ""
            else try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            finally in.close()
          if (code != 200)
            throw new java.io.IOException(
              s"pubsub: publish to $topic answered $code: " +
                resp.take(300))
          // the REST contract acks every message with an id — a
          // short ack is a partial publish and must fail the batch
          val ids = """"messageIds"\s*:\s*\[(.*?)\]""".r
            .findFirstMatchIn(resp).map(_.group(1).trim).getOrElse("")
          val acked = if (ids.isEmpty) 0 else ids.count(_ == ',') + 1
          if (acked < messages.size)
            throw new java.io.IOException(
              s"pubsub: $topic acked $acked of ${messages.size}")
          counter.add(messages.size.toLong)
        }
        def jsonMsg(r: org.apache.spark.sql.Row): String = {
          val data = java.util.Base64.getEncoder.encodeToString(
            r.get(2) match {
              case s: String => s.getBytes(
                java.nio.charset.StandardCharsets.UTF_8)
              case b: Array[Byte] => b // lua byte values verbatim
            })
          val key =
            if (r.getBoolean(3))
              s""","orderingKey":"${r.getString(1)
                .replace("\\", "\\\\").replace("\"", "\\\"")}""""
            else ""
          s"""{"data":"$data"$key}"""
        }
        // batch consecutive same-topic messages; flush on topic
        // change or the size cap — sequential posts keep per-key
        // order inside the partition
        var topic: String = null
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        def flush(): Unit =
          if (buf.nonEmpty) { post(topic, buf.toSeq); buf.clear() }
        rows.foreach { r =>
          val t = r.getString(0)
          if (topic != null && (t != topic || buf.size >= perPublish))
            flush()
          topic = t
          buf += jsonMsg(r)
        }
        flush()
      }
    counter.value
  }
}

/** File-output sizing — the small-files control for object-store sinks
  * (the S3/file destination path, flow/connectors/s3/qrep.go writes one
  * Avro object per partition): bound BOTH the number of writer tasks and
  * the rows per file, so a 100 TB write neither produces millions of tiny
  * objects nor single-task giants. */
object ParquetSink {
  /** Write `df` with ≈`rowsPerFile` rows per output file: repartition to
    * ceil(n/rowsPerFile) writer tasks (round-robin — even sizes without a
    * key) and cap rows per file for safety on skewed task inputs. Returns
    * the row count (one extra job; callers with a known count can pass
    * it via `knownCount`). */
  def writeSized(df: DataFrame, path: String, rowsPerFile: Long,
      knownCount: Long = -1L): Long = {
    val n = if (knownCount >= 0) knownCount else df.count()
    val parts = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartition(parts)
      .write.option("maxRecordsPerFile", rowsPerFile)
      .mode("overwrite").parquet(path)
    n
  }
}

/** Elasticsearch destination — shaping AND the live `_bulk` HTTP wire
  * (flow/connectors/elasticsearch/ posts batches via the official
  * client's BulkIndexer; the underlying API is plain HTTP POST of
  * NDJSON to `/_bulk`, a public REST surface): each change row becomes
  * an action line with `_id` = primary key (the natural-upsert
  * property: re-indexing the same id is idempotent) plus a source
  * line; deletes become delete actions with no source line.
  * [[EsSink.bulkPublish]] ships the pairs with one HTTP connection per
  * Spark partition — the same distributed fan-out as the Kafka
  * destination. Input should be the per-batch latest-per-key frame
  * (the reference dedups the batch before bulk dispatch). */
object EsSink {
  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(c.cast("string"),
      lit("\\\\"), lit("\\\\\\\\")), lit("\""), lit("\\\\\""))

  /** QRep shaping (flow/connectors/elasticsearch/qrep.go:40-170):
    * every pulled row becomes an `index` action with its JSON column
    * map as the source. Document id per the reference's upsert-key
    * arity (qrep.go:30-38,105-112): no keys → the cluster
    * autogenerates; one key → its printed value; several → the
    * base64-rawurl SHA-256 of the concatenated printed values. Keys
    * missing from the schema are skipped like the reference's warned
    * columns; NULL key values print as Go's "<nil>" so both sides
    * derive the same id for the same row. */
  def qrepRecords(df: DataFrame, index: String,
      keys: Seq[String]): DataFrame = {
    val source = to_json(struct(df.columns.map(col): _*))
    val present = keys.filter(df.columns.contains)
    val printed = (k: String) =>
      coalesce(col(k).cast("string"), lit("<nil>"))
    val id: Option[Column] = present match {
      case Seq() => None
      case Seq(k) => Some(printed(k))
      case ks =>
        // base64.RawURLEncoding of the raw sha256 bytes: hex → bytes
        // → base64, '+/' → '-_', padding stripped
        Some(regexp_replace(
          translate(base64(unhex(sha2(concat(ks.map(printed): _*),
            256))), "+/", "-_"), "=+$", ""))
    }
    val action = id match {
      case Some(i) => concat(
        lit(s"""{"index":{"_index":"$index","_id":""""), esc(i),
        lit("\"}}"))
      case None => lit(s"""{"index":{"_index":"$index"}}""")
    }
    df.select(action.as("action"), source.cast("string").as("source"))
  }

  def bulkRecords(df: DataFrame, index: String, id: Column, source: Column,
      deleted: Column): DataFrame = {
    val action = (verb: String) => concat(
      lit(s"""{"$verb":{"_index":"$index","_id":""""), esc(id),
      lit("\"}}"))
    df.select(
      when(deleted, action("delete")).otherwise(action("index"))
        .as("action"),
      when(deleted, lit("")).otherwise(source.cast("string"))
        .as("source"))
  }

  /** POST a [[bulkRecords]] frame to a live cluster: NDJSON chunks of
    * `actionsPerBulk` actions to `<baseUrl>/_bulk`, one connection per
    * Spark partition. The response's top-level `"errors"` flag is the
    * per-bulk failure signal (the REST contract) — a true value fails
    * the batch loudly rather than dropping rows. Returns the action
    * count shipped. */
  def bulkPublish(shaped: DataFrame, baseUrl: String,
      actionsPerBulk: Int = 500,
      connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 30000): Long = {
    val counter =
      shaped.sparkSession.sparkContext.longAccumulator("es_actions")
    val url = baseUrl.stripSuffix("/")
    shaped.select(col("action"), col("source")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        def post(ndjson: String, n: Int): Unit = {
          val conn = new java.net.URL(s"$url/_bulk").openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setConnectTimeout(connectTimeoutMs)
          conn.setReadTimeout(readTimeoutMs)
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type",
            "application/x-ndjson")
          val bytes = ndjson.getBytes(
            java.nio.charset.StandardCharsets.UTF_8)
          conn.setFixedLengthStreamingMode(bytes.length)
          val out = conn.getOutputStream
          try { out.write(bytes); out.flush() } finally out.close()
          val code = conn.getResponseCode
          val in = if (code >= 400) conn.getErrorStream
            else conn.getInputStream
          val body = if (in == null) ""
            else try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            finally in.close()
          if (code / 100 != 2)
            throw new java.io.IOException(s"es: _bulk answered $code")
          // the REST contract: per-item failures surface as
          // "errors":true at the top level of the response
          if (body.contains("\"errors\":true"))
            throw new java.io.IOException(
              "es: bulk response reports item errors")
          counter.add(n.toLong)
        }
        val buf = new StringBuilder
        var n = 0
        rows.foreach { row =>
          buf.append(row.getString(0)).append('\n')
          val src = row.getString(1)
          if (src != null && src.nonEmpty)
            buf.append(src).append('\n')
          n += 1
          if (n >= actionsPerBulk) {
            post(buf.toString, n); buf.clear(); n = 0
          }
        }
        if (n > 0) post(buf.toString, n)
    }
    counter.value
  }
}
