package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink helpers — SURVEY.md §2 "Sources / sinks".
  *
  * Parquet is the primary format (columnar, pushdown-friendly); csv/json
  * round-trips cover interchange. Partitioned writes give partition-pruned
  * reads (the 100 TB table layout: partition on the coarse filter key);
  * bucketed writes pre-shuffle on the join key so repeated fact-fact joins
  * skip their Exchange entirely.
  */
object Writers {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partitionCols`; reads with a filter on those columns list only the
    * matching directories (partition pruning — no data files touched).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table: pre-shuffled on the join/agg key. A join of
    * two tables bucketed the same way plans as a zero-Exchange sort-merge
    * join — at 100 TB this converts every repeated join on the key from a
    * full shuffle into a local merge.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Fixed-width (mainframe/EBCDIC-export style) text ingest: one
    * substring projection per field off the raw `text` source — a purely
    * narrow scan stage (codegen'd substrings, no regex, no shuffle), so
    * it scales exactly like the parquet path. `fields` is
    * (name, startPos1Based, length, typeDdl); values are trimmed then
    * try_cast (ANSI-safe), with cast failures surfacing as nulls for a
    * downstream Expectations gate to quarantine.
    *
    * Offsets are CHARACTER positions on the decoded line, so layouts
    * are assumed single-byte-encoded (ASCII / latin-1 / an
    * EBCDIC-to-ASCII conversion) — the usual case for fixed-width
    * exports. A multibyte UTF-8 character in the data would shift every
    * subsequent field's byte offsets; byte-positional layouts need a
    * binary-substring variant, deliberately out of scope here. Field
    * names and type DDL are validated (identifier / type-ish shape)
    * before entering the generated expression — the layout tuple is
    * config, not a SQL injection surface.
    */
  def readFixedWidth(spark: SparkSession, path: String,
                     fields: Seq[(String, Int, Int, String)]): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val ident = "^[A-Za-z_][A-Za-z0-9_]*$".r
    val typeDdl = "^[A-Za-z0-9_ (),]+$".r
    fields.foreach { case (name, start, len, ddl) =>
      require(ident.matches(name), s"invalid field name '$name'")
      require(typeDdl.matches(ddl), s"invalid type DDL '$ddl' for field '$name'")
      require(start >= 1 && len >= 1, s"invalid slice [$start, $len] for '$name'")
    }
    val raw = spark.read.text(path)
    raw.select(fields.map { case (name, start, len, ddl) =>
      expr(s"try_cast(trim(substring(value, $start, $len)) AS $ddl)").as(name)
    }: _*)
  }

  /** Dynamic partition overwrite: replaces ONLY the partitions present in
    * `df`, leaving sibling partitions untouched — the incremental-reload
    * primitive for a partitioned 100 TB table (nightly re-materialization
    * of changed days without rewriting history).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Schema-evolved read: union the schemas of all files under `path`
    * (columns absent in older files come back null) — how a long-lived
    * table absorbs additive schema changes without a rewrite.
    */
  def readMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
