package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.RawTable

class SinksSpec extends SparkSpec {

  private val target = MergeTarget(
    table = "pub.dst", stagingTable = "stage.batch",
    pkColumns = Seq("id"),
    schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType))))

  test("CREATE TABLE carries engine metadata columns and PK") {
    val ddl = MergeSqlGenerator.createTable(target)
    assert(ddl.contains(""""id" BIGINT NOT NULL"""))
    assert(ddl.contains(""""v" DOUBLE PRECISION"""))
    assert(ddl.contains(s""""${RawTable.Version}" BIGINT NOT NULL"""))
    assert(ddl.contains("""PRIMARY KEY ("id")"""))
  }

  test("mirror.nullable propagation (PEERDB_NULLABLE, postgres " +
    "client.go:713-716): with nullableEnabled a source-NOT-NULL " +
    "value column creates NOT NULL; off (reference default) leaves " +
    "every non-key column nullable; keys are NOT NULL either way") {
    val t = target.copy(schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("req", StringType, nullable = false),
      StructField("opt", StringType, nullable = true))))
    val off = MergeSqlGenerator.createTable(t)
    assert(off.contains(""""id" BIGINT NOT NULL"""))
    assert(!off.contains(""""req" VARCHAR NOT NULL"""), off)
    val on = MergeSqlGenerator.createTable(
      t.copy(nullableEnabled = true))
    assert(on.contains(""""req" VARCHAR NOT NULL"""), on)
    assert(!on.contains(""""opt" VARCHAR NOT NULL"""), on)
    // CH: NOT NULL is the UNWRAPPED type (no Nullable(...))
    val ch = MergeSqlGenerator.createTable(
      t.copy(nullableEnabled = true),
      graft.types.QKind.Dialect.ClickHouse)
    assert(ch.contains("`req` String"), ch)
    assert(!ch.contains("`req` Nullable(String)"), ch)
    assert(ch.contains("`opt` Nullable(String)"), ch)
  }

  test("CREATE TABLE in each warehouse dialect (wide fixture)") {
    import graft.types.QKind.Dialect
    // Owners-style wide fixture: one column per interesting type family.
    val wide = target.copy(schema = StructType(Seq(
      StructField("id", LongType),
      StructField("flag", BooleanType),
      StructField("price", DecimalType(20, 4)),
      StructField("ratio", DoubleType),
      StructField("name", StringType),
      StructField("born", DateType),
      StructField("seen", TimestampType),
      StructField("blob", BinaryType),
      StructField("tags", ArrayType(StringType, containsNull = true)))))

    val sf = MergeSqlGenerator.createTable(wide, Dialect.Snowflake)
    assert(sf.contains(""""id" INTEGER NOT NULL"""))
    assert(sf.contains(""""price" NUMERIC(20,4)"""))
    assert(sf.contains(""""ratio" FLOAT"""))
    assert(sf.contains(""""seen" TIMESTAMP_TZ"""))
    assert(sf.contains(""""blob" BINARY"""))
    assert(sf.contains(""""tags" VARIANT"""))
    assert(sf.contains(s""""${RawTable.SyncedAt}" TIMESTAMP_NTZ"""))
    assert(sf.contains("""PRIMARY KEY ("id")"""))

    val ch = MergeSqlGenerator.createTable(wide, Dialect.ClickHouse)
    assert(ch.contains("`id` Int64,")) // PK: bare, not Nullable
    assert(ch.contains("`flag` Nullable(Bool)"))
    assert(ch.contains("`price` Nullable(Decimal(20, 4))"))
    assert(ch.contains("`name` Nullable(String)"))
    assert(ch.contains("`born` Nullable(Date32)"))
    assert(ch.contains("`tags` Array(String)")) // arrays never Nullable
    assert(ch.contains(s"ENGINE = ReplacingMergeTree(" +
      s"`${RawTable.Version}`, `${RawTable.IsDeleted}`)"))
    assert(ch.contains("ORDER BY (`id`)"))
    // hard-delete targets: version-only engine args
    val chHard = MergeSqlGenerator.createTable(
      wide.copy(softDelete = false), Dialect.ClickHouse)
    assert(chHard.contains(
      s"ENGINE = ReplacingMergeTree(`${RawTable.Version}`)"))

    val bq = MergeSqlGenerator.createTable(wide, Dialect.BigQuery)
    assert(!bq.contains("PARTITION BY"), "off by default")
    // PEERDB_BIGQUERY_ENABLE_SYNCED_AT_PARTITIONING_BY_DAYS
    // (bigquery.go:742-752): day partitioning on the synced-at column,
    // PARTITION BY before CLUSTER BY (the BQ DDL clause order)
    val bqPart = MergeSqlGenerator.createTable(
      wide.copy(bqSyncedAtPartitioning = true), Dialect.BigQuery)
    assert(bqPart.contains(
      s") PARTITION BY DATE(`${RawTable.SyncedAt}`) CLUSTER BY `id`"),
      bqPart)
    assert(bq.contains("`id` INT64 NOT NULL"))
    assert(bq.contains("`price` BIGNUMERIC(20,4)"))
    assert(bq.contains("`ratio` FLOAT64"))
    assert(bq.contains("`seen` TIMESTAMP"))
    assert(bq.contains("`blob` BYTES"))
    assert(bq.contains("`tags` ARRAY<STRING>"))
    assert(bq.contains("CLUSTER BY `id`"))
    assert(!bq.contains("PRIMARY KEY"))
  }

  test("MERGE: version guard, plain SET (NULL overwrites), delete branch") {
    val m = MergeSqlGenerator.merge(target, Seq(""))
    assert(m.contains("""ON dst."id" = src."id""""))
    // A present NULL must overwrite — no COALESCE on value columns.
    assert(m.contains(""""name" = src."name""""))
    assert(!m.contains("COALESCE(src.\"name\""))
    assert(m.contains(
      s"""src."${RawTable.Version}" >= dst."${RawTable.Version}""""))
    assert(m.contains(s""""${RawTable.IsDeleted}" = TRUE"""))
    assert(!m.contains("THEN DELETE"))
    val hard = MergeSqlGenerator.merge(target.copy(softDelete = false),
      Seq(""))
    assert(hard.contains("THEN DELETE"))
    assert(hard.contains(s"""AND NOT src."${RawTable.IsDeleted}" THEN"""))
  }

  test("MERGE: one UPDATE branch per absent-column combination") {
    val m = MergeSqlGenerator.merge(target,
      absentCombos = Seq("", "name", "name,v"))
    // Combination '' sets every value column; 'name' omits name;
    // 'name,v' omits both (metadata-only update).
    assert(m.contains("""= '' THEN"""))
    assert(m.contains("""= 'name' THEN"""))
    assert(m.contains("""= 'name,v' THEN"""))
    val branches = m.split("WHEN MATCHED AND NOT").toSeq.drop(1)
    assert(branches.size == 3)
    val full = branches.find(_.contains("= ''")).get
    assert(full.contains(""""name" = src."name""""))
    assert(full.contains(""""v" = src."v""""))
    val noName = branches.find(_.contains("= 'name' ")).get
    assert(!noName.contains(""""name" = src."name""""))
    assert(noName.contains(""""v" = src."v""""))
    val metaOnly = branches.find(_.contains("= 'name,v'")).get
    assert(!metaOnly.contains(""""name" = src."name""""))
    assert(!metaOnly.contains(""""v" = src."v""""))
    assert(metaOnly.contains(s""""${RawTable.Version}" = src."""))
  }

  test("UPSERT fallback: ON CONFLICT per combination with version guard") {
    val stmts = MergeSqlGenerator.upsertFallback(
      target.copy(softDelete = false), absentCombos = Seq("", "v"))
    assert(stmts.size == 3) // two combos + trailing DELETE
    assert(stmts.head.contains("""ON CONFLICT ("id") DO UPDATE SET"""))
    // the guard references the target by its AS alias — a quoted
    // schema-qualified chain is not a valid column qualifier there
    assert(stmts.head.contains("""INSERT INTO "pub"."dst" AS dst"""))
    assert(stmts.head.contains(
      s"""dst."${RawTable.Version}" <=\n  EXCLUDED."${RawTable.Version}""""))
    // Combination-filtered source and no SET of the absent column.
    val comboV = stmts.find(_.contains("= 'v'")).get
    assert(comboV.contains("""WHERE COALESCE(src."_absent_cols", '')"""))
    assert(!comboV.contains(""""v" = EXCLUDED."v""""))
    assert(comboV.contains(""""name" = EXCLUDED."name""""))
    assert(stmts.last.startsWith("""DELETE FROM "pub"."dst""""))
  }

  test("stageFrame encodes the absent array as CSV; combos collected") {
    import spark.implicits._
    val normalized = Seq(
      (1L, "a", Seq.empty[String]),
      (2L, "b", Seq("name")),
      (3L, "c", Seq("name", "v")))
      .toDF("id", "name", graft.cdc.Normalizer.AbsentCols)
    val staged = MergeSqlGenerator.stageFrame(normalized)
    assert(staged.schema(graft.cdc.Normalizer.AbsentCols).dataType ==
      org.apache.spark.sql.types.StringType)
    assert(MergeSqlGenerator.absentCombosOf(staged) ==
      Seq("", "name", "name,v"))
    // The DataFrame overload derives its branch set from the batch itself:
    // every staged combination gets a WHEN MATCHED branch (none skipped).
    val m = MergeSqlGenerator.merge(target, staged)
    assert(m.contains("= '' THEN") && m.contains("= 'name' THEN") &&
      m.contains("= 'name,v' THEN"))
    assert(MergeSqlGenerator.upsertFallback(target, staged).size == 3)
  }

  test("stageAvro writes loadable OCF files of the staged encoding") {
    import spark.implicits._
    val normalized = Seq(
      (1L, "a", Seq.empty[String]),
      (2L, null.asInstanceOf[String], Seq("name")))
      .toDF("id", "name", graft.cdc.Normalizer.AbsentCols)
    val dir = tmpDir("avro_merge_stage")
    val files = MergeSqlGenerator.stageAvro(normalized, dir)
    assert(files.nonEmpty)
    val schema = MergeSqlGenerator.stageFrame(normalized).schema
    val rows = files.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val in = path.getFileSystem(
        spark.sparkContext.hadoopConfiguration).open(path)
      val bytes = try in.readAllBytes() finally in.close()
      AvroStage.readContainer(bytes, schema)
    }.sortBy(_.getLong(0))
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      == Seq((1L, "a", ""), (2L, null, "name")))
  }

  test("sized writes bound files and rows per file") {
    val dir = tmpDir("sizedout")
    val n = ParquetSink.writeSized(
      spark.range(0, 10000).toDF("id"), dir, rowsPerFile = 2500)
    assert(n == 10000L)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, files.length.toString)
    // Re-read intact and no file exceeds the cap.
    assert(spark.read.parquet(dir).count() == 10000L)
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 2500L)
    }
  }

  test("queue records take the kafka sink shape with routing hook") {
    import spark.implicits._
    val raw = Seq(("u1", 1L, "pub.t", """{"id":1}""", 0))
      .toDF(RawTable.Uid, RawTable.Timestamp, RawTable.DestinationTable,
        RawTable.Data, RawTable.RecordType)

    val out = QueueSink.defaultRecords(raw)
    assert(out.columns.toSeq ==
      Seq("topic", "key", "value", "headers"))
    val r = out.collect().head
    assert(r.getAs[String]("topic") == "pub.t")
    assert(r.getAs[String]("key") == "u1")
    assert(r.getAs[String]("value").contains("\"_peerdb_record_type\":0"))

    val routed = QueueSink.records(raw,
      topic = concat(lit("cdc."), col(RawTable.DestinationTable)),
      key = col(RawTable.Timestamp),
      value = col(RawTable.Data),
      headers = Map("src" -> lit("graft")))
    val rr = routed.collect().head
    assert(rr.getAs[String]("topic") == "cdc.pub.t")
    assert(rr.getAs[String]("value") == """{"id":1}""")
  }

  test("fnv1a32 column fold matches the reference FNV-1a algorithm") {
    import spark.implicits._
    // JVM reference: the exact partition_hash.go algorithm
    def fnvRef(s: String): Long = {
      var h = 2166136261L
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ (b & 0xFFL)) * 16777619L) % 4294967296L
      }
      h
    }
    val inputs = Seq("", "0", "123", "4521", "hub_click", "a-b-c")
    val got = inputs.toDF("s")
      .select(graft.sinks.QueueSink.fnv1a32($"s").as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == inputs.map(fnvRef), got.mkString(","))
    // the empty-string value is the documented FNV offset basis
    assert(got.head == 2166136261L)
    // NULL hashes like the empty string (eventhub.go nil-value branch)
    val nullGot = Seq[Option[String]](None).toDF("s")
      .select(graft.sinks.QueueSink.fnv1a32($"s").as("h"))
      .collect().head.getLong(0)
    assert(nullGot == 2166136261L)
  }

  test("eventHubsRecords: per-(hub, partition) batch packing bounds " +
    "batch size and numbers batches in order") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, "u1")).toDF("id", "k")
    val out = QueueSink.eventHubsRecords(df,
      namespace = org.apache.spark.sql.functions.lit("ns"),
      hub = org.apache.spark.sql.functions.lit("h"),
      partitionValue = $"k",
      value = $"id".cast("string"),
      partitionCount = 4, maxPerBatch = 3, order = $"id")
      .collect()
    // one key → one partition; 10 events at ≤3 per batch → seqs 0,0,0,1…
    assert(out.map(_.getAs[String]("partition_key")).distinct.length == 1)
    val seqs = out.sortBy(_.getAs[String]("value").toLong)
      .map(_.getAs[Long]("batch_seq")).toSeq
    assert(seqs == Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L, 3L))
  }
}
