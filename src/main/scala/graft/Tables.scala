package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed-ish loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Reads stay fully declarative (`spark.read.parquet` + downstream
  * select/filter) so Catalyst pushes predicates and column pruning into the
  * parquet scan — at 100 TB the scan is the dominant cost and pushdown is
  * the first-order optimization.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (no native
    * Spark type — read nanos as long, truncate to micros, exactly what
    * micro-precision DuckDB does) and plain TIMESTAMP(MICROS) (read
    * natively, as NTZ under Spark 4's parquet inference). Adapt on the
    * schema actually read so either vintage of the generated data loads
    * to the same session-UTC TimestampType column and oracle
    * comparisons line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    val fixed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      case _ =>
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
    }
    raw.withColumn("ts", fixed)
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** SQL-first front door: every table as a temp view (events with its
    * nanos->micros fix baked in) plus all graft functions registered —
    * after this, the entire engine is usable from `spark.sql(...)`
    * alone, which is how notebook/BI users and SQL-only migrations
    * consume it. Views are lazy logical plans: no data is read here,
    * and pushdown through a view is identical to the DataFrame path.
    */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => read(s, d, t).createOrReplaceTempView(t))
    events(s, d).createOrReplaceTempView("events")
    functions.Register.all(s)
  }
}
