package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Typed user-defined aggregators (the Aggregator[IN, BUF, OUT] rung of
  * the extension ladder).
  */

/** Approximate heavy hitters via the SpaceSaving sketch (Metwally 2005):
  * at most `capacity` counters per partition buffer; when full, the
  * incoming item takes over the minimum counter (inheriting its count —
  * the classic overestimate bound of N/capacity). Exact whenever distinct
  * items <= capacity. Buffers merge associatively, so Spark runs this as
  * a normal partial aggregation: map-side sketches, one shuffled merge.
  */
class TopKItems(k: Int, capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def bump(b: mutable.Map[String, Long], item: String, by: Long): Unit = {
    b.get(item) match {
      case Some(c) => b(item) = c + by
      case None if b.size < capacity => b(item) = by
      case None =>
        val (minItem, minCnt) = b.minBy(_._2)
        b.remove(minItem)
        b(item) = minCnt + by
    }
  }

  override def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    bump(b, item, 1L); b
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (item, cnt) => bump(a, item, cnt) }
    a
  }

  override def finish(b: mutable.Map[String, Long]): Map[String, Long] =
    b.toSeq.sortBy { case (item, cnt) => (-cnt, item) }.take(k).toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
