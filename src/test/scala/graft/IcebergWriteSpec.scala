package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Iceberg WRITER round-trips: create+append through [[IcebergWrite]]
  * read back via [[IcebergRead]] (the same cross-validation the Delta
  * leg gets), bounds-driven pruning from footer-harvested stats,
  * snapshot time travel, and the loud refusal gates.
  */
class IcebergWriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import sources.{IcebergRead, IcebergWrite}

  private def tmp(): String =
    Files.createTempDirectory("graft_icew").toString + "/t"

  private def range(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id").as("k"),
      concat(lit("u"), col("id").cast("string")).as("name"))

  test("create + append round-trip through IcebergRead with time travel") {
    val dir = tmp()
    assert(IcebergWrite.create(range(0, 100).coalesce(1), dir) == 1L)
    assert(IcebergWrite.append(range(100, 150).coalesce(1), dir) == 2L)
    val back = IcebergRead.read(spark, dir)
    assert(back.columns.toSeq == Seq("k", "name"))
    assert(back.count() == 150)
    assert(back.agg(sum("k")).head().getLong(0) == (0L until 150).sum)
    // snapshot time travel sees the pre-append table
    val v1 = IcebergRead.read(spark, dir, snapshotId = 1)
    assert(v1.count() == 100 && v1.agg(max("k")).head().getLong(0) == 99)
    // footer-harvested bounds made it into the manifests and prune
    val (total, kept) = IcebergRead.pruneReport(spark, dir, "k >= 120")
    assert(total >= 2 && kept == 1, s"bounds skipping broken: $kept of $total")
    assert(IcebergRead.readWhere(spark, dir, "k >= 120").count() == 30)
  }

  test("schema drift and unsupported types refuse loudly") {
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.append(
        spark.range(0, 1).select(col("id").as("k")), dir)
    }
    assert(e.getMessage.contains("schema"))
    // nested types refused at create
    val e2 = intercept[IllegalArgumentException] {
      IcebergWrite.create(
        spark.range(0, 1).select(struct(col("id").as("a")).as("s")), tmp())
    }
    assert(e2.getMessage.contains("unsupported"))
    // double-create refused
    val e3 = intercept[IllegalArgumentException] {
      IcebergWrite.create(range(0, 1), dir)
    }
    assert(e3.getMessage.contains("append"))
  }

  test("racing appends: every row lands exactly once, distinct snapshots") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)
    val pool = Executors.newFixedThreadPool(3)
    val gate = new CountDownLatch(1)
    val outcomes = (0 until 3).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          IcebergWrite.append(
            range(100 + i * 10, 110 + i * 10).coalesce(1), dir)
        }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val snaps = outcomes.map(_.get()).sorted
    assert(snaps == Seq(2L, 3L, 4L),
      s"each append must win a distinct snapshot: $snaps")
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 40)
    assert(back.select("k").distinct().count() == 40, "no row duplicated")
  }

  test("a stale version-hint falls back to the listing") {
    val dir = tmp()
    IcebergWrite.create(range(0, 10).coalesce(1), dir)
    IcebergWrite.append(range(10, 20).coalesce(1), dir)
    // overwrite through the hadoop fs (keeps the .crc sidecar in sync)
    val hp = new org.apache.hadoop.fs.Path(s"$dir/metadata/version-hint.text")
    val hf = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = hf.create(hp, true)
    try o.write("99".getBytes("UTF-8")) finally o.close()
    assert(IcebergRead.read(spark, dir).count() == 20,
      "hint to a missing metadata file must fall back to the listing")
  }

  test("date/timestamp columns round-trip (no bounds, still correct)") {
    val dir = tmp()
    val df = spark.sql(
      """SELECT id AS k, DATE'2024-01-01' + CAST(id AS INT) AS d,
               TIMESTAMP'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts
         FROM range(0, 5)""")
    IcebergWrite.create(df.coalesce(1), dir)
    val back = IcebergRead.read(spark, dir)
    assert(back.count() == 5)
    assert(back.schema("d").dataType.typeName == "date")
    assert(back.agg(max("d")).head().getDate(0).toString == "2024-01-05")
  }
}
