package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch decode over opaque binary payloads — the Scala analog of a
  * pandas-UDF/mapInPandas stage: typed rows in, per-partition codec
  * instance, typed feature rows out. The codec here is a clearly marked
  * STUB (this container has no image/audio libraries); everything around
  * it — schema, encoders, partition-batched execution, column pruning of
  * the upstream scan — is the real plumbing a decoder plugs into.
  */
object Multimodal {

  case class BinDoc(doc_id: Long, payload: Array[Byte], lang: String)
  case class DecodedDoc(doc_id: Long, lang: String, byte_len: Int,
                        checksum: Long, fake_width: Int, fake_height: Int)

  /** STUB codec: a real implementation would wrap e.g. libjpeg/ffmpeg and
    * be constructed once per partition (expensive init amortized across
    * the batch) — exactly how this is structured.
    */
  private class StubCodec {
    def decode(payload: Array[Byte]): (Int, Long, Int, Int) = {
      var crc = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) { crc ^= (payload(i) & 0xffL); crc *= 0x100000001b3L; i += 1 }
      (payload.length, crc, payload.length % 1024, (payload.length / 7) % 768)
    }
  }

  /** m02: per-partition batched decode (rows-only; MultimodalSpec). */
  def decodeBatch(spark: SparkSession, dir: String): Dataset[DecodedDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("lang"))
      .as[BinDoc]
      .mapPartitions { iter =>
        val codec = new StubCodec // one per partition, like a real decoder
        iter.map { doc =>
          val (len, crc, w, h) = codec.decode(doc.payload)
          DecodedDoc(doc.doc_id, doc.lang, len, crc, w, h)
        }
      }
  }
}
