package graft.sinks

import java.net.{URLEncoder, HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live Azure Event Hubs destination over the public REST send API —
  * the engine half of flow/connectors/eventhub/ (the reference speaks
  * AMQP 1.0 through the Azure SDK; the service's documented HTTP
  * surface carries the same send semantics and is what an offline
  * fixture can pin):
  *
  *   - routing/batching is [[QueueSink.eventHubsRecords]] — FNV-1a32
  *     of the partition value modulo the partition count
  *     (partition_hash.go:16, eventhub.go:283-299) and per-(hub,
  *     partition) EventDataBatch packing with `max_per_batch` events
  *     per batch (hub_batches.go), `batch_seq` numbering the batches
  *     in order;
  *   - each batch POSTs to
  *     `/{hub}/partitions/{partition}/messages?api-version=2014-01`
  *     as a ServiceBus JSON batch
  *     (`Content-Type: application/vnd.microsoft.servicebus.json`,
  *     body `[{"Body":"…"},…]`) with a SharedAccessSignature header —
  *     the HMAC-SHA256 SAS scheme (sr/sig/se/skn) the service
  *     documents;
  *   - batches of one (hub, partition) ship sequentially in
  *     `batch_seq` order on one connection; distinct partitions fan
  *     out across Spark partitions — the reference's per-partition
  *     batch ordering, distributed.
  *
  * URL: `eventhubs://host:port/namespace?key_name=…&key=…&
  * partition_count=N&max_per_batch=M[&tls=true]` (the real service is
  * `{namespace}.servicebus.windows.net:443` with `tls=true`). */
object EventHubsSink {

  /** SAS token for one resource URI — the documented scheme:
    * `SharedAccessSignature sr={enc(uri)}&sig={base64 hmacsha256(key,
    * enc(uri) + "\n" + expiry)}&se={expiry}&skn={keyName}`. */
  def sasToken(resourceUri: String, keyName: String, key: String,
      expiryEpochS: Long): String = {
    val enc = URLEncoder.encode(resourceUri, "UTF-8")
    val toSign = enc + "\n" + expiryEpochS
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key.getBytes(UTF_8), "HmacSHA256"))
    val sig = URLEncoder.encode(java.util.Base64.getEncoder
      .encodeToString(mac.doFinal(toSign.getBytes(UTF_8))), "UTF-8")
    s"SharedAccessSignature sr=$enc&sig=$sig&se=$expiryEpochS&skn=$keyName"
  }

  /** Strict binary→string for a lua-shaped `value`: the REST JSON
    * batch body cannot ship raw bytes, and a plain cast would replace
    * non-UTF-8 sequences (msgpack.encode output) with U+FFFD
    * silently. Spark 4's `decode` is itself strict under the default
    * coding action; the round-trip comparison is the backstop when
    * the legacy lenient decode is configured. Stays in codegen. */
  def utf8StrictValue(value: Column): Column = {
    val s = decode(value, "UTF-8")
    when(value.isNull, lit(null).cast("string"))
      .when(encode(s, "UTF-8") === value, s)
      .otherwise(raise_error(lit("eventhubs: lua script produced a " +
        "non-UTF-8 byte value; the REST JSON transport cannot ship " +
        "raw bytes — use kafka:// for binary payloads or encode " +
        "them in the script")))
  }

  /** Default mirror routing: hub = destination table, partition value
    * = uid (the reference partitions by the scoped destination's
    * partition column; the uid default matches the Kafka default's
    * key choice), payload = the change row as JSON. Output adds
    * `__rn` so the publisher can keep event order inside each batch
    * after the shuffle. */
  def defaultRecords(raw: DataFrame, namespace: String,
      partitionCount: Int, maxPerBatch: Int): DataFrame =
    records(raw, namespace = lit(namespace),
      hub = col(graft.model.RawTable.DestinationTable),
      partitionValue = col(graft.model.RawTable.Uid),
      value = to_json(struct(raw.columns.map(col): _*)),
      partitionCount = partitionCount, maxPerBatch = maxPerBatch,
      order = col(graft.model.RawTable.Uid))

  /** [[QueueSink.eventHubsRecords]] with the in-batch row number kept
    * — the publisher's sort key. */
  def records(df: DataFrame, namespace: Column, hub: Column,
      partitionValue: Column, value: Column, partitionCount: Int,
      maxPerBatch: Int, order: Column): DataFrame = {
    require(partitionCount > 0 && maxPerBatch > 0,
      "partitionCount and maxPerBatch must be positive")
    val pk = pmod(QueueSink.fnv1a32(partitionValue),
      lit(partitionCount.toLong)).cast("string")
    df.select(namespace.cast("string").as("namespace"),
        hub.cast("string").as("hub"), pk.as("partition_key"),
        value.cast("string").as("value"), order.as("__ord"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("namespace", "hub", "partition_key")
          .orderBy("__ord")))
      .withColumn("batch_seq",
        expr(s"CAST((__rn - 1) DIV $maxPerBatch AS BIGINT)"))
      .select("namespace", "hub", "partition_key", "batch_seq", "__rn",
        "value")
  }

  /** Publish a [[records]] frame. Returns events sent; a non-201
    * answer fails the batch loudly. */
  def publish(shaped: DataFrame, url: String): Long = {
    val ep = graft.cdc.CaptureEndpoint.parse(url)
    require(ep.scheme == "eventhubs",
      s"eventhubs:// url expected, got '$url'")
    val scheme = if (ep.param("tls", "false") == "true") "https"
      else "http"
    val base = s"$scheme://${ep.host}:${ep.port}"
    val keyName = ep.param("key_name", "RootManageSharedAccessKey")
    val key = ep.params.getOrElse("key",
      throw new IllegalArgumentException(
        "eventhubs url needs ?key=… for the SAS signature"))
    val ttlS = ep.param("sas_ttl_s", "3600").toLong
    val connectMs = ep.param("connect_timeout_ms", "5000").toInt
    val readMs = ep.param("read_timeout_ms", "30000").toInt
    val counter = shaped.sparkSession.sparkContext
      .longAccumulator("eventhubs_published")
    shaped
      .repartition(col("hub"), col("partition_key"))
      .sortWithinPartitions(col("hub"), col("partition_key"),
        col("batch_seq"), col("__rn"))
      .select("hub", "partition_key", "batch_seq", "value")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        def post(hub: String, partition: String,
            bodies: Seq[String]): Unit = {
          val body = bodies.map { v =>
            "{\"Body\":\"" + v.replace("\\", "\\\\")
              .replace("\"", "\\\"") + "\"}"
          }.mkString("[", ",", "]")
          val conn = new URL(s"$base/$hub/partitions/$partition" +
            "/messages?api-version=2014-01&timeout=60")
            .openConnection().asInstanceOf[HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setConnectTimeout(connectMs)
          conn.setReadTimeout(readMs)
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type",
            "application/vnd.microsoft.servicebus.json")
          conn.setRequestProperty("Authorization",
            sasToken(s"$base/$hub", keyName, key,
              System.currentTimeMillis() / 1000 + ttlS))
          val bytes = body.getBytes(UTF_8)
          conn.setFixedLengthStreamingMode(bytes.length)
          val out = conn.getOutputStream
          try out.write(bytes) finally out.close()
          val code = conn.getResponseCode
          val in = if (code >= 400) conn.getErrorStream
            else conn.getInputStream
          val resp = if (in == null) ""
            else try new String(in.readAllBytes(), UTF_8)
            finally in.close()
          if (code != 201)
            throw new java.io.IOException(
              s"eventhubs: send to $hub/$partition answered $code: " +
                resp.take(300))
          counter.add(bodies.size.toLong)
        }
        // flush on scope/batch change — consecutive rows of one
        // (hub, partition) arrive in batch_seq order by the sort
        var scope: (String, String, Long) = null
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        def flush(): Unit =
          if (buf.nonEmpty) { post(scope._1, scope._2, buf.toSeq)
            buf.clear() }
        rows.foreach { r =>
          val s = (r.getString(0), r.getString(1), r.getLong(2))
          if (scope != null && s != scope) flush()
          scope = s
          buf += r.getString(3)
        }
        flush()
      }
    counter.value
  }
}
