package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Native Spark bucketing for co-located joins — the storage-layout twin
  * of [[graft.cdc.MergeWriter]]'s directory buckets. MergeWriter's
  * `_g_bucket=` partition directories give MERGE its pruning; what they
  * do NOT give is shuffle-free joins, because the file layout carries no
  * catalog-visible hash-distribution contract. `bucketBy` does: two
  * tables bucketed (and sorted) by the same key with the same bucket
  * count join with ZERO Exchange — at 100 TB that removes the dominant
  * cost of every repeated fact⋈fact join (dedup-cluster resolution
  * joining back to the corpus, raw⋈normalized reconciliation, QRep
  * watermark frames joining prior state). Write once bucketed, join
  * every downstream pass for free; BucketedJoinSpec pins the
  * zero-exchange plan as a regression.
  *
  * Bucketed tables must go through the session catalog (the
  * distribution contract lives in table metadata, not in the files —
  * a plain `spark.read.parquet` of the same path would NOT co-locate),
  * which is why this takes a table name and registers an EXTERNAL table
  * at `path`. */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)
}
