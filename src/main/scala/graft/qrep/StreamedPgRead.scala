package graft.qrep

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}

import graft.cdc.PgRows

/** The ONE executor-side streamed-read idiom for live PostgreSQL
  * pulls, shared by the exported-snapshot CTID slices
  * ([[graft.mirror.SnapshotFlow.readTable]]), the QRep range pulls
  * ([[LivePgPull]]), and the xmin scan ([[LivePgXmin]]) — the MySQL
  * twin is [[LiveMysqlPull]]'s `rowsOf`.
  *
  * One connection per work item; `setup` statements establish the
  * transaction posture (REPEATABLE READ, snapshot import) before the
  * cursor opens; rows decode LAZILY off the socket (the reference's
  * QRecordStream, flow/connectors/postgres/qrep_query_executor.go:
  * 282-520) and re-enter the declarative plan as JSON → `from_json`
  * (the CDC decode path, so values cannot diverge across paths).
  * Per-task memory is O(row), never O(slice).
  *
  * Close discipline — all three legs, in one place: the trailing
  * by-name concat closes each item's connection at exhaustion (not at
  * task end); a TaskContext completion listener covers task death with
  * the iterator abandoned un-exhausted; the catch covers failures
  * before the iterator is handed off. */
object StreamedPgRead {

  def frame[A: scala.reflect.ClassTag](spark: SparkSession,
      url: String, items: Seq[A], setup: Seq[String],
      sqlOf: A => String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val urlSer = url
    val setupSer = setup
    val sqlSer = sqlOf
    val jsonRows = spark.createDataset(
      spark.sparkContext.parallelize(items, math.max(1, items.size))
        .mapPartitions { it =>
          it.flatMap { a =>
            val c = graft.server.PgClients.connect(urlSer)
            val tc = org.apache.spark.TaskContext.get()
            if (tc != null)
              tc.addTaskCompletionListener[Unit](_ => c.close())
            try {
              setupSer.foreach(c.queryAll(_))
              val cur = c.queryCursor(sqlSer(a))
              val (names, oids) = (cur.columns, cur.typeOids)
              cur.map(PgRows.json(names, oids, _)) ++ {
                c.close(); Iterator.empty
              }
            } catch { case e: Throwable => c.close(); throw e }
          }
        })(Encoders.STRING)
    jsonRows.select(from_json(col("value"), schema).as("r"))
      .select(schema.fieldNames.map(f => col(s"r.$f")).toSeq: _*)
  }
}
