package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2 batch SINK — the write-path half of the connector
  * surface (graft-synth covers reads). `graft-blackhole` accepts any
  * schema, writes nothing, and publishes exact row/byte/task counts
  * through the V2 commit protocol:
  *
  *  - every task's `DataWriter` tallies rows/bytes locally and returns
  *    them as its `WriterCommitMessage`;
  *  - the driver's `BatchWrite.commit` sums ONLY the messages of tasks
  *    that committed — a retried or speculatively-duplicated task's
  *    abandoned attempt never double-counts, which is exactly the
  *    exactly-once contract a real sink (parquet committer, JDBC
  *    transaction) builds on this same hook.
  *
  * Use: `df.write.format("graft-blackhole").option("name", "run1")
  * .mode("append").save()`, then `MetricsSink.result("run1")`. Serves as
  * a zero-I/O throughput harness (measure pipeline cost without sink
  * cost) and as the reference implementation of the commit protocol.
  */
class MetricsSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-blackhole"
  // write-only: take the query's schema as-is, never infer one
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new BlackholeTable(schema,
      Option(properties.get("name")).getOrElse("default"))
}

object MetricsSink {
  /** Committed totals for one named write: (rows, bytes, n_tasks). */
  final case class Committed(rows: Long, bytes: Long, tasks: Int)
  private val results = new ConcurrentHashMap[String, Committed]()
  def result(name: String): Option[Committed] = Option(results.get(name))
  private[sources] def publish(name: String, c: Committed): Unit =
    results.put(name, c)
}

private[sources] class BlackholeTable(writeSchema: StructType, writeName: String)
  extends Table with SupportsWrite {
  override def name(): String = s"graft_blackhole($writeName)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // truncate (overwrite mode) is a no-op for a sink with no state
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BlackholeBatchWrite(writeName)
      }
    }
}

private[sources] final case class TaskTally(rows: Long, bytes: Long)
  extends WriterCommitMessage

private[sources] class BlackholeBatchWrite(name: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BlackholeWriterFactory
  /** Driver-side: aggregate exactly the committed task attempts. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tallies = messages.collect { case t: TaskTally => t }
    MetricsSink.publish(name, MetricsSink.Committed(
      tallies.map(_.rows).sum, tallies.map(_.bytes).sum, tallies.length))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class BlackholeWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        record match {
          case u: UnsafeRow => bytes += u.getSizeInBytes
          case _ => ()
        }
      }
      override def commit(): WriterCommitMessage = TaskTally(rows, bytes)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
