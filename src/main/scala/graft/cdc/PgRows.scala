package graft.cdc

/** Text-format PG result rows → the engine's JSON row images, by
  * RowDescription type OID — one renderer shared by every live
  * query-result reader (snapshot CTID slices, live QRep pulls), and
  * deliberately the SAME per-type logic pgoutput tuples take
  * ([[PgOutput.columnJson]]): a snapshot/QRep row and a CDC row of the
  * same value can never diverge on rendering. */
object PgRows {

  /** One result row → a JSON object string keyed by column name.
    * SQL NULL renders as an absent... no: as `"col":null`, exactly
    * like a pgoutput NULL tuple column. */
  def json(columns: Seq[String], typeOids: Seq[Int],
      row: Seq[Option[String]]): String = {
    val parts = columns.indices.flatMap { i =>
      val rc = PgOutput.RelationColumn(0, columns(i),
        if (i < typeOids.length) typeOids(i) else 0, -1)
      val tv = row(i) match {
        case None => PgOutput.NullColumn
        case Some(txt) => PgOutput.TextColumn(
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      PgOutput.columnJson(rc, tv).map(j => "\"" + rc.name + "\":" + j)
    }
    parts.mkString("{", ",", "}")
  }

  /** RowDescription OIDs → the Spark schema those rows decode to via
    * [[json]] + `from_json` (same OID→type mapping CDC relations
    * use). */
  def schemaOf(columns: Seq[String], typeOids: Seq[Int])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      columns.zip(typeOids).map { case (n, oid) =>
        org.apache.spark.sql.types.StructField(n,
          PgOutput.oidToQKind(oid).toSpark)
      })
}
