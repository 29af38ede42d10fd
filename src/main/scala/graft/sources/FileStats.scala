package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import scala.jdk.CollectionConverters._

/** File-level zone maps for [[SnapshotTable]] — the data-skipping layer
  * every production table format carries (Delta file stats, Iceberg
  * manifest metrics, ORC/parquet zone maps surfaced to the PLANNER
  * instead of being discovered row-group-late inside the scan).
  *
  * Collection is METADATA-ONLY: stats come from the parquet FOOTERS of
  * the freshly written segment (one ~KB footer read per file — parquet
  * already computed min/max/null counts during the write), never from a
  * second scan of the data. At 100 TB the footer pass is O(files) tiny
  * RPCs at commit time, and the payoff is that a selective `readWhere`
  * opens only the files whose [min,max] interval can satisfy the
  * predicate — the same reason v27_skipping_audit measures layout
  * clustering: a sorted/z-ordered table turns a point query into a
  * handful of file opens.
  *
  * Soundness rules (pruning may only ever SKIP files that provably
  * cannot match — every "don't know" keeps the file):
  *   - only top-level primitive columns with valid footer stats are
  *     prunable; anything else answers "maybe";
  *   - numeric compares go through BigDecimal (a long→double cast above
  *     2^53 could mis-prune);
  *   - string compares use unsigned UTF-8 byte order — parquet's UTF8
  *     sort order for binary stats — NOT Java's UTF-16 compareTo (the
  *     two diverge past the BMP); truncated binary stats stay sound
  *     because parquet adjusts a truncated max upward;
  *   - INT96 timestamps (deprecated ordering) are never collected;
  *   - unknown null counts disable null-predicate pruning for the file.
  */
object FileStats {
  /** Per-column zone map entry. `kind`: "l" integer-backed (int/long/
    * date-days/timestamp-micros), "d" float/double, "s" UTF-8 string.
    * `lo`/`hi` are None when the file holds no non-null value for the
    * column. `nulls` is -1 when the footer did not record a null count.
    */
  final case class ColStat(kind: String, lo: Option[String],
                           hi: Option[String], nulls: Long, rows: Long) {
    def allNull: Boolean = nulls >= 0 && nulls == rows
  }

  /** Footer-read stats for `files` (paths relative to `tablePath`).
    * Columns whose stats are missing/invalid in ANY row group of a file
    * are dropped for that file — absent entries mean "cannot prune".
    */
  def collect(spark: SparkSession, tablePath: String,
              files: Seq[String]): Map[String, Map[String, ColStat]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { rel =>
      rel -> footerStats(new Path(s"$tablePath/$rel"), conf)
    }.toMap
  }

  /** Exact row count of one parquet file from its footer alone — always
    * available even when no column contributed usable zone-map stats
    * (e.g. all-boolean schemas). Writers use this for per-file
    * record counts; a whole-batch count would overstate every file.
    */
  def rowCount(spark: SparkSession, tablePath: String, rel: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(s"$tablePath/$rel"), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }

  private def footerStats(p: Path, conf: org.apache.hadoop.conf.Configuration)
      : Map[String, ColStat] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // merge row-group chunks per column; a column is prunable only if
      // every row group contributed valid stats
      val perCol = scala.collection.mutable.Map[String, Option[ColStat]]()
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          if (!name.contains('.')) { // top-level leaves only
            val next = chunkStat(c)
            perCol(name) = (perCol.get(name), next) match {
              case (None, n)                  => n
              case (Some(Some(a)), Some(bb))  => mergeStat(a, bb)
              case _                          => None
            }
          }
        }
      }
      perCol.toMap.collect { case (k, Some(st)) =>
        k -> st.copy(rows = rows)
      }
    } finally reader.close()
  }

  private def chunkStat(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData)
      : Option[ColStat] = {
    val s = c.getStatistics
    if (s == null || s.isEmpty) return None
    val nulls = if (s.isNumNullsSet) s.getNumNulls else -1L
    val prim = c.getPrimitiveType
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val logical = prim.getLogicalTypeAnnotation
    val isUtf8 = logical != null && logical.isInstanceOf[
      org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation]
    // decimal stats (round 10): footer min/max live in the UNSCALED
    // domain (decimal(9,2) 12.34 stored as 1234) — rendered here into
    // the SCALED BigDecimal domain as "d" stats, which cmpValues
    // compares via BigDecimal, so this is EXACT, never lossy
    val decScale: Option[Int] = logical match {
      case d: org.apache.parquet.schema.LogicalTypeAnnotation
          .DecimalLogicalTypeAnnotation => Some(d.getScale)
      case _ => None
    }
    if (!s.hasNonNullValue) {
      // no min/max recorded; only usable when we KNOW everything is null
      return if (nulls >= 0) Some(ColStat(decScale.map(_ => "d")
        .orElse(kindOf(prim.getPrimitiveTypeName, logical, isUtf8))
        .getOrElse("l"), None, None, nulls, 0L))
      else None
    }
    if (decScale.isDefined) {
      val scale = decScale.get
      def dec(v: AnyRef): Option[String] = v match {
        case i: java.lang.Integer => Some(java.math.BigDecimal
          .valueOf(i.longValue, scale).toPlainString)
        case l: java.lang.Long => Some(java.math.BigDecimal
          .valueOf(l.longValue, scale).toPlainString)
        case b: org.apache.parquet.io.api.Binary =>
          Some(new java.math.BigDecimal(
            new java.math.BigInteger(b.getBytes), scale).toPlainString)
        case _ => None
      }
      return for {
        lo <- dec(s.genericGetMin.asInstanceOf[AnyRef])
        hi <- dec(s.genericGetMax.asInstanceOf[AnyRef])
      } yield ColStat("d", Some(lo), Some(hi), nulls, 0L)
    }
    kindOf(prim.getPrimitiveTypeName, logical, isUtf8).map { kind =>
      val (lo, hi) = (prim.getPrimitiveTypeName, kind) match {
        case (INT32, _)  => (s.genericGetMin.toString, s.genericGetMax.toString)
        case (INT64, _)  => (s.genericGetMin.toString, s.genericGetMax.toString)
        case (FLOAT, _)  =>
          (s.genericGetMin.asInstanceOf[java.lang.Float].doubleValue.toString,
           s.genericGetMax.asInstanceOf[java.lang.Float].doubleValue.toString)
        case (DOUBLE, _) => (s.genericGetMin.toString, s.genericGetMax.toString)
        case (BINARY, "s") =>
          (s.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
             .toStringUsingUTF8,
           s.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
             .toStringUsingUTF8)
        case other => throw new IllegalStateException(s"unreachable $other")
      }
      ColStat(kind, Some(lo), Some(hi), nulls, 0L)
    }
  }

  /** Soundness gate on the LOGICAL annotation: INT32/INT64 stats are
    * only comparable against the literal's rendered value when both live
    * in the SAME domain. Spark writes decimal(<=9) as INT32 and
    * decimal(<=18) as INT64 with UNSCALED values (12.34 stored as 1234),
    * and TIMESTAMP(MILLIS) stores millis while TimestampType literals
    * render micros — in those cases compare domains diverge and pruning
    * would silently drop matching files, so we answer None (keep file).
    * Accepted: no annotation (plain int/long), IntLogicalType, DATE
    * (days, matches DateType literal), TIMESTAMP(MICROS) (matches
    * TimestampType literal under Spark's default outputTimestampType).
    */
  private def kindOf(t: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
                     logical: org.apache.parquet.schema.LogicalTypeAnnotation,
                     isUtf8: Boolean): Option[String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation._
    def intLike: Boolean = logical match {
      case null                         => true
      case _: IntLogicalTypeAnnotation  => true
      case _: DateLogicalTypeAnnotation => true
      case ts: TimestampLogicalTypeAnnotation =>
        ts.getUnit == TimeUnit.MICROS
      case _ => false // decimal (unscaled), TIMESTAMP(MILLIS/NANOS), time…
    }
    t match {
      case INT32 | INT64 if intLike => Some("l")
      case FLOAT | DOUBLE           => Some("d")
      case BINARY if isUtf8         => Some("s")
      case _                        => None // boolean/int96/fixed/decimal: skip
    }
  }

  private def mergeStat(a: ColStat, b: ColStat): Option[ColStat] = {
    if (a.kind != b.kind) return None
    val nulls = if (a.nulls < 0 || b.nulls < 0) -1L else a.nulls + b.nulls
    def pick(x: Option[String], y: Option[String], takeLo: Boolean) =
      (x, y) match {
        case (Some(u), Some(v)) =>
          val c = cmpValues(a.kind, u, v)
          Some(if ((c <= 0) == takeLo) u else v)
        case (u, v) => u.orElse(v)
      }
    Some(ColStat(a.kind, pick(a.lo, b.lo, takeLo = true),
      pick(a.hi, b.hi, takeLo = false), nulls, 0L))
  }

  /** Per-(file, column) Bloom filter attached by an explicit
    * `SnapshotTable.buildBlooms` pass — the point-lookup complement to
    * zone maps: a high-cardinality unclustered column (ids, hashes,
    * emails) spans nearly the full value range in EVERY file, so
    * [min,max] intervals prune nothing, while a 16 KB bloom answers
    * "definitely not in this file" for equality probes with ~1% false
    * positives. `kind` is the compare domain ("s" string / "l"
    * integer); bits are the [[graft.functions.BloomFilterAgg]]
    * serialization, base64 in the manifest.
    */
  final case class FileBloom(kind: String, numHashes: Int, bitsB64: String)

  // ---- pruning ----------------------------------------------------------

  /** Conservative zone-map test: false ONLY when no row of a file with
    * these stats can satisfy `pred` (unresolved Catalyst tree from
    * `expr(...)`). Anything unrecognized answers true.
    */
  def mayMatch(pred: Expression, st: Map[String, ColStat]): Boolean = pred match {
    case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
    case Or(l, r)  => mayMatch(l, st) || mayMatch(r, st)
    // eq is symmetric: whichever orientation fails extraction answers
    // true, so the && keeps exactly the valid orientation's verdict
    case EqualTo(l, r) => cmpTest(l, r, st, "eq") && cmpTest(r, l, st, "eq")
    case LessThan(a, lit: Literal)  => cmpTest(a, lit, st, "lt")
    case LessThan(lit: Literal, a)  => cmpTest(a, lit, st, "gt")
    case LessThanOrEqual(a, lit: Literal) => cmpTest(a, lit, st, "le")
    case LessThanOrEqual(lit: Literal, a) => cmpTest(a, lit, st, "ge")
    case GreaterThan(a, lit: Literal)     => cmpTest(a, lit, st, "gt")
    case GreaterThan(lit: Literal, a)     => cmpTest(a, lit, st, "lt")
    case GreaterThanOrEqual(a, lit: Literal) => cmpTest(a, lit, st, "ge")
    case GreaterThanOrEqual(lit: Literal, a) => cmpTest(a, lit, st, "le")
    case EqualNullSafe(a, Literal(null, _)) => nullTest(a, st, wantNull = true)
    case EqualNullSafe(l, r) =>
      cmpTest(l, r, st, "eq") && cmpTest(r, l, st, "eq")
    case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists(l => cmpTest(a, l, st, "eq"))
    case IsNull(a)    => nullTest(a, st, wantNull = true)
    case IsNotNull(a) => nullTest(a, st, wantNull = false)
    case Not(IsNull(a))    => nullTest(a, st, wantNull = false)
    case Not(IsNotNull(a)) => nullTest(a, st, wantNull = true)
    case _ => true
  }

  /** Bloom test: false ONLY when the predicate requires an equality the
    * file's bloom provably excludes (no false negatives by construction
    * — absent blooms, unprobeable types, and every non-equality shape
    * answer true). Layered AND-wise with [[mayMatch]] by the caller.
    */
  def mayMatchBloom(pred: Expression,
                    blooms: Map[String, FileBloom]): Boolean = pred match {
    case _ if blooms.isEmpty => true
    case And(l, r) => mayMatchBloom(l, blooms) && mayMatchBloom(r, blooms)
    case Or(l, r)  => mayMatchBloom(l, blooms) || mayMatchBloom(r, blooms)
    case EqualTo(a, lit: Literal) => bloomProbe(a, lit, blooms)
    case EqualTo(lit: Literal, a) => bloomProbe(a, lit, blooms)
    case EqualNullSafe(a, lit: Literal) if lit.value != null =>
      bloomProbe(a, lit, blooms)
    case EqualNullSafe(lit: Literal, a) if lit.value != null =>
      bloomProbe(a, lit, blooms)
    case In(a, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      list.exists(l => bloomProbe(a, l.asInstanceOf[Literal], blooms))
    case _ => true
  }

  private def bloomProbe(a: Expression, lit: Literal,
                         blooms: Map[String, FileBloom]): Boolean = {
    import org.apache.spark.sql.types._
    val r = for {
      n  <- attrName(a)
      fb <- blooms.get(n)
      // the bloom hashes the column VALUE's toString; only literal
      // types whose toString matches that domain may probe
      sv <- (lit.dataType, fb.kind) match {
        case (StringType, "s") if lit.value != null =>
          Some(lit.value.toString)
        case (ByteType | ShortType | IntegerType | LongType, "l")
            if lit.value != null =>
          Some(lit.value.toString)
        case _ => None
      }
    } yield bloomContains(fb, sv)
    r.getOrElse(true)
  }

  private def bloomContains(fb: FileBloom, s: String): Boolean = {
    val bytes = java.util.Base64.getDecoder.decode(fb.bitsB64)
    val numBits = bytes.length * 8
    val (h1, h2) = graft.functions.BloomUtil.hashPair(s)
    var i = 0
    while (i < fb.numHashes) {
      val b = graft.functions.BloomUtil.bit(h1, h2, i, numBits)
      // BloomFilterAgg serializes the long[] big-endian (see
      // BloomMightContain for the same byte/bit arithmetic)
      val byteIdx = (b >>> 6) * 8 + 7 - ((b & 63) >>> 3)
      if ((bytes(byteIdx) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.nameParts.head)
    case a: AttributeReference                           => Some(a.name)
    case _                                               => None
  }

  private def nullTest(a: Expression, st: Map[String, ColStat],
                       wantNull: Boolean): Boolean =
    (for (n <- attrName(a); c <- st.get(n)) yield {
      if (wantNull) c.nulls != 0 // unknown (-1) => maybe
      else !c.allNull
    }).getOrElse(true)

  /** Interval test of `a <op> lit` against [lo, hi]; `op` already
    * normalized so the attribute is on the left.
    */
  private def cmpTest(a: Expression, litE: Expression,
                      st: Map[String, ColStat], op: String): Boolean = {
    val r = for {
      n    <- attrName(a)
      c    <- st.get(n)
      lit  <- litValue(litE, c.kind)
    } yield {
      if (c.lo.isEmpty || c.hi.isEmpty)
        // no non-null values recorded: a comparison can only match if
        // some non-null value exists — allNull files never match
        !c.allNull
      else {
        val lo = cmpValues(c.kind, c.lo.get, lit)  // sign of (lo - lit)
        val hi = cmpValues(c.kind, c.hi.get, lit)  // sign of (hi - lit)
        op match {
          case "eq" => lo <= 0 && hi >= 0
          case "lt" => lo < 0   // some value < lit  iff  min < lit
          case "le" => lo <= 0
          case "gt" => hi > 0   // some value > lit  iff  max > lit
          case "ge" => hi >= 0
        }
      }
    }
    r.getOrElse(true)
  }

  /** Literal rendered into the stat's comparison domain; None = cannot
    * compare soundly (type mismatch, null, NaN) => caller keeps file.
    */
  private def litValue(e: Expression, kind: String): Option[String] = e match {
    case Literal(null, _) => None
    case Literal(v, dt) =>
      import org.apache.spark.sql.types._
      (dt, kind) match {
        case (ByteType | ShortType | IntegerType | LongType, "l" | "d") =>
          Some(v.toString)
        case (DateType, "l")      => Some(v.toString)      // days since epoch
        case (TimestampType, "l") => Some(v.toString)      // micros since epoch
        case (FloatType, "l" | "d") =>
          val d = v.asInstanceOf[Float].toDouble
          if (d.isNaN) None else Some(d.toString)
        case (DoubleType, "l" | "d") =>
          val d = v.asInstanceOf[Double]
          if (d.isNaN) None else Some(d.toString)
        case (_: DecimalType, "l" | "d") => Some(v.toString)
        case (StringType, "s") => Some(v.toString)
        case _ => None
      }
    case _ => None
  }

  /** Three-way compare in the stat domain: "l"/"d" BigDecimal, "s"
    * unsigned UTF-8 bytes (parquet's UTF8 sort order).
    */
  private[sources] def cmpValues(kind: String, x: String, y: String): Int =
    kind match {
      case "s" =>
        val (a, b) = (x.getBytes("UTF-8"), y.getBytes("UTF-8"))
        var i = 0
        while (i < a.length && i < b.length) {
          val c = (a(i) & 0xff) - (b(i) & 0xff)
          if (c != 0) return Integer.signum(c)
          i += 1
        }
        Integer.signum(a.length - b.length)
      case _ =>
        new java.math.BigDecimal(x).compareTo(new java.math.BigDecimal(y))
    }
}
