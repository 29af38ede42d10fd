package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 batch connector — the "write a new source" half of
  * the extensibility surface (expressions/aggregates/physical operators
  * cover the compute half).
  *
  * `graft-synth` generates a deterministic synthetic documents table
  * entirely at the executors: no files, no driver materialization, any
  * number of rows split across `partitions` input splits. It implements
  * the two contracts that make a V2 source scale-correct:
  *
  *  - **Filter pushdown as partition pruning** (`SupportsPushDownFilters`):
  *    range/equality predicates on `doc_id` are absorbed at planning time
  *    and used to drop whole input partitions whose id range can't match
  *    — the same mechanism a parquet/iceberg source uses to skip files.
  *    Handled filters are re-checked row-level only at partition
  *    boundaries (the reader narrows its own range), so nothing is
  *    re-evaluated post-scan.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only the requested fields — `text` (the expensive
  *    column) is never built for a `select(doc_id, lang)`.
  *
  * Usage: `spark.read.format("graft-synth").option("rows", 1e6)
  * .option("partitions", 32).load()`; registered by short name through
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`.
  *
  * Rows are a pure function of (doc_id, seed): a splitmix64 chain picks
  * 20-60 words from a fixed vocabulary, so any two reads — any cluster,
  * any partitioning — agree cell-for-cell, which is what makes a
  * generated source usable in reproducible tests and benchmarks.
  */
class SynthDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthDocsSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new SynthTable(
      java.lang.Long.parseLong(Option(properties.get("rows")).getOrElse("1000")),
      Integer.parseInt(Option(properties.get("partitions")).getOrElse("4")),
      java.lang.Long.parseLong(Option(properties.get("seed")).getOrElse("42")),
      java.lang.Long.parseLong(Option(properties.get("rowsPerBatch")).getOrElse("100")))
}

object SynthDocsSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val langs = Array("en", "fr", "de", "es")
  private val sources = Array("web", "books", "wiki", "news", "forum")
  private val vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog spark shuffles partition " +
      "broadcast join hash sort merge scan filter project window stream " +
      "state batch columnar codegen vector").split(" ")

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The full row for `id` as (lang, source, text). Pure and cheap. */
  def row(id: Long, seed: Long): (String, String, String) = {
    val h = mix64(id * 31 + seed)
    val n = 20 + (math.abs(h) % 41).toInt
    val sb = new java.lang.StringBuilder(n * 8)
    var i = 0
    var s = h
    while (i < n) {
      s = mix64(s)
      if (i > 0) sb.append(' ')
      sb.append(vocab((math.abs(s) % vocab.length).toInt))
      i += 1
    }
    (langs((math.abs(mix64(h + 1)) % langs.length).toInt),
      sources((math.abs(mix64(h + 2)) % sources.length).toInt),
      sb.toString)
  }
}

private[sources] class SynthTable(rows: Long, partitions: Int, seed: Long,
                                  rowsPerBatch: Long)
  extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows rows)"
  override def schema(): StructType = SynthDocsSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, seed, rowsPerBatch)
}

private[graft] class SynthScanBuilder(rows: Long, partitions: Int, seed: Long,
                                        rowsPerBatch: Long = 100)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates {

  private var lo: Long = 0L            // inclusive doc_id lower bound
  private var hi: Long = rows - 1      // inclusive doc_id upper bound
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthDocsSource.fullSchema

  /** Absorb doc_id range predicates into [lo, hi]; everything else is
    * left for Spark to evaluate post-scan (returned as unhandled).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    handled.foreach {
      case EqualTo(_, v) =>
        val x = v.asInstanceOf[Number].longValue
        lo = math.max(lo, x); hi = math.min(hi, x)
      case GreaterThan(_, v) => lo = math.max(lo, v.asInstanceOf[Number].longValue + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, v.asInstanceOf[Number].longValue)
      case LessThan(_, v) => hi = math.min(hi, v.asInstanceOf[Number].longValue - 1)
      case LessThanOrEqual(_, v) => hi = math.min(hi, v.asInstanceOf[Number].longValue)
      case _ => ()
    }
    pushed = handled
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) with no grouping is answerable from the id bounds alone —
    * complete pushdown: the scan returns the FINAL one-row answer and no
    * document is ever generated. (Only offered when every filter was
    * absorbed above; Spark won't ask otherwise.)
    */
  private var countPushed = 0 // number of pushed COUNT(*) columns
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().forall(_.isInstanceOf[CountStar])
  override def pushAggregation(agg: Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      countPushed = agg.aggregateExpressions().length
      true
    }

  override def build(): Scan =
    if (countPushed > 0)
      new SynthCountScan(math.max(0L, hi - lo + 1), countPushed, pushed)
    else
      new SynthScan(rows, partitions, seed, lo, hi, required, pushed, rowsPerBatch)
}

/** The planning-time COUNT(*) answer: one partition, one row. */
private[sources] class SynthCountScan(count: Long, nCols: Int,
                                      pushedF: Array[Filter])
  extends Scan with Batch {
  override def readSchema(): StructType =
    StructType((0 until nCols).map(i => StructField(s"count_$i", LongType, false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth aggPushed=count($count) PushedFilters: ${pushedF.mkString("[", ", ", "]")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthPartition(0, 0))
  override def createReaderFactory(): PartitionReaderFactory = {
    val c = count
    val n = nCols
    (_: InputPartition) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(Seq.fill(n)(c))
      override def close(): Unit = ()
    }
  }
}

private[graft] class SynthScan(rows: Long, partitions: Int, seed: Long,
                                 lo: Long, hi: Long, required: StructType,
                                 pushed: Array[Filter], rowsPerBatch: Long = 100)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // ---- runtime filtering (the V2 dynamic-partition-pruning hook) ----
  // At execution time Spark can hand the scan filters derived from a
  // completed join build side (doc_id IN (...)); narrowing [lo, hi] with
  // them drops input partitions that static pushdown could not — the
  // DSv2 analog of DPP skipping parquet partitions. Semantics stay
  // correct because runtime pruning may return a superset: ids inside
  // the narrowed bounds but outside the IN-set are discarded by the join
  // itself.
  private var rtLo: Long = Long.MinValue
  private var rtHi: Long = Long.MaxValue
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("doc_id", vs) if vs.nonEmpty =>
      val ids = vs.collect { case n: Number => n.longValue }
      if (ids.nonEmpty) {
        rtLo = math.max(rtLo, ids.min); rtHi = math.min(rtHi, ids.max)
      }
    case EqualTo("doc_id", v: Number) =>
      rtLo = math.max(rtLo, v.longValue); rtHi = math.min(rtHi, v.longValue)
    case _ => () // unusable runtime filter: prune nothing, stay correct
  }
  private def effLo: Long = math.max(lo, rtLo)
  private def effHi: Long = math.min(hi, rtHi)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(rows, seed, rowsPerBatch, required)

  /** Post-pushdown size estimate: row count is exact from the pruned id
    * bounds; bytes use a per-column width model (`text` dominates at
    * ~240 chars). Reporting statistics lets Catalyst choose broadcast
    * joins for small synth tables WITHOUT a hint — the planner autonomy
    * every production source (parquet footers, iceberg manifests)
    * provides its optimizer.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo + 1)
    private val widths = Map("doc_id" -> 8L, "lang" -> 4L, "source" -> 6L,
      "text" -> 280L, "n_chars" -> 8L)
    private val rowBytes =
      math.max(8L, required.fieldNames.map(widths.getOrElse(_, 16L)).sum)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * rowBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }
  override def description(): String =
    s"graft-synth rows=$rows bounds=[$lo,$hi] PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  /** Fixed-width id ranges; ranges disjoint from [lo, hi] are DROPPED
    * here, at planning time — the pruning a filter pushdown exists for.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val (l, h) = (effLo, effHi)
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0 until partitions).iterator
      .map { p => SynthPartition(p * per, math.min((p + 1) * per, rows) - 1) }
      .filter(ip => ip.last >= ip.first && ip.last >= l && ip.first <= h)
      .map(ip => SynthPartition(math.max(ip.first, l), math.min(ip.last, h))
        : InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(seed, required)
}

private[graft] case class SynthPartition(first: Long, last: Long) extends InputPartition

/** Offsets are simply "ids generated so far" — a monotone high-water
  * mark, serialized as its decimal string for the checkpoint log.
  */
private[sources] case class SynthOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** Micro-batch stream over the same generator: each batch covers the id
  * range (start, end] with at most `rowsPerBatch` new ids per trigger,
  * until `rows` are exhausted. Pacing goes through
  * `SupportsAdmissionControl.latestOffset(start, limit)` — the form
  * that RECEIVES the restored start offset — rather than the legacy
  * zero-argument `latestOffset`: a freshly constructed stream on
  * restart has no instance state, and deriving "next" from a mutable
  * high-water mark regresses the offset log below the checkpoint and
  * re-delivers committed batches (observed: 400 duplicate rows). With
  * admission control the stream is stateless; restart resumption is
  * exactly the kafka-source consumer-offset replay guarantee.
  */
private[sources] class SynthMicroBatchStream(rows: Long, seed: Long,
                                             rowsPerBatch: Long,
                                             required: StructType)
  extends MicroBatchStream with SupportsAdmissionControl {
  private def id(o: Offset): Long = o match {
    case SynthOffset(i) => i
    case other => java.lang.Long.parseLong(other.json()) // restored form
  }
  override def initialOffset(): Offset = SynthOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    SynthOffset(math.min(rows, id(start) + rowsPerBatch))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control form latestOffset(start, limit) is used")
  override def deserializeOffset(json: String): Offset =
    SynthOffset(java.lang.Long.parseLong(json))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = id(start)
    val e = id(end)
    if (e <= s) Array.empty
    else Array(SynthPartition(s, e - 1))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(seed, required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class SynthReaderFactory(seed: Long, required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var id = p.first - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { id += 1; id <= p.last }
      override def get(): InternalRow = {
        // build text lazily: only when some string column is required
        lazy val r = SynthDocsSource.row(id, seed)
        InternalRow.fromSeq(fields.toSeq.map {
          case "doc_id" => id
          case "lang" => UTF8String.fromString(r._1)
          case "source" => UTF8String.fromString(r._2)
          case "text" => UTF8String.fromString(r._3)
          case "n_chars" => r._3.length.toLong
        })
      }
      override def close(): Unit = ()
    }
  }
}
