package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the most common enterprise ETL endpoint, via
  * Spark's built-in DataSource (`spark.read.jdbc` / `df.write.jdbc`),
  * wrapped with the two options that decide whether a relational pull
  * scales or melts the database:
  *
  *   1. '''Predicate/column pushdown''' is automatic: a
  *      `readJdbc(...).filter(p).select(cols)` plans as
  *      `SELECT cols FROM t WHERE p` ON THE DATABASE — only matching
  *      rows cross the wire. The spec pins `PushedFilters` in the scan.
  *   2. '''Partitioned read''' ([[readJdbcPartitioned]]): without it a
  *      JDBC read is ONE task on one executor — a non-starter for a
  *      multi-TB table. `(partitionColumn, lowerBound, upperBound,
  *      numPartitions)` issues one range-bounded query per partition,
  *      so 1000 executors each pull their slice concurrently. Bounds
  *      outside the true min/max are safe (first/last partitions are
  *      open-ended); skewed keys want roughly-uniform stride columns
  *      (surrogate ids, epoch timestamps).
  *
  * Writes: [[writeJdbc]] uses `numPartitions`-bounded parallel INSERT
  * batches (`batchsize` rows per round-trip). Overwrite drops/recreates
  * (or `TRUNCATE` when `truncate=true` and the dialect supports it).
  * Idempotence at 100 TB: land into a staging table, then one
  * transactional `INSERT ... SELECT`/MERGE on the database — the same
  * write-audit-publish shape SnapshotTable.commitGated applies to files.
  *
  * Tested against in-JVM embedded Derby (ships with Spark — zero new
  * dependencies); the URL is the only thing that changes for
  * Postgres/MySQL/Oracle, whose dialects Spark also bundles.
  */
object JdbcIO {

  /** Single-partition read of `table` (a table name OR a
    * `(SELECT ...) alias` pushdown subquery). Fine for dimension-sized
    * tables; use [[readJdbcPartitioned]] for anything big.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties)
      : DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * range-bounded queries over `partitionCol` (must be numeric, date,
    * or timestamp). This is THE lever that makes a JDBC pull cluster-
    * parallel instead of a single-task bottleneck.
    */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          partitionCol: String, lower: Long, upper: Long,
                          numPartitions: Int,
                          props: java.util.Properties =
                            new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      props)

  /** Parallel batched write. `numPartitions` caps concurrent database
    * connections (repartitioning down if the frame has more);
    * `batchsize` rows ride each INSERT round-trip.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.ErrorIfExists,
                numPartitions: Int = 8, batchSize: Int = 1000,
                props: java.util.Properties = new java.util.Properties)
      : Unit =
    df.write.mode(mode)
      .option("numPartitions", numPartitions)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}
