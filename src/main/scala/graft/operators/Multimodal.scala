package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, plus batch decode / feature-extract / frame-sample stages.
  *
  * The reference decodes opaque LoRa byte payloads into typed fields
  * (MyDatacollector/lib/MyLoRaCode.py:434-530); the training-data analogue
  * is image/audio/video blobs with decode UDFs. The decode libraries are
  * not in this container, so [[decodeStub]] is a clearly-marked
  * deterministic fake — but the Spark-side plumbing (schema, typed
  * Dataset, mapPartitions batch shape, partition sizing) is real and
  * tested.
  *
  * Scale notes (100 TB): blobs ride in the row (parquet binary); decode is
  * a mapPartitions pass so per-batch library init (a real codec would be
  * expensive to construct) amortizes across a partition, mirroring
  * mapInPandas batch semantics. Repartition by byte size before decode so
  * a few huge media files don't skew executors.
  */
object Multimodal {

  /** A media row: opaque bytes + metadata a catalog would carry. */
  case class MediaRecord(media_id: Long, mime: String, content: Array[Byte])

  /** Decoded features of one media object (stub schema: what an image
    * decode would yield). */
  case class DecodedMedia(media_id: Long, width: Int, height: Int,
                          n_frames: Int, brightness: Double)

  /** Wrap a text corpus as a media table: content = UTF-8 bytes, mime
    * from the source column. Models binary ingestion without external
    * fixtures (the driver testdata has no blob column). */
  def asMediaTable(docs: DataFrame, id: Column, text: Column,
                   source: Column): DataFrame =
    docs.select(id.as("media_id"),
      concat(lit("application/x-"), source).as("mime"),
      text.cast("binary").as("content"))

  /** Typed decode stage. STUB: the real body would call an image/audio
    * codec per record (`???` in production form); this deterministic fake
    * derives plausible fields from the bytes so the pipeline shape —
    * typed Dataset in, typed Dataset out, per-partition batching — is
    * exercised end-to-end.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Real decoder: init codec ONCE per partition here (expensive).
      it.map { m =>
        val n = m.content.length
        // ??? <- real image decode would replace everything below.
        val w = 16 + (n % 64)
        val h = 16 + ((n / 64) % 64)
        val sum = m.content.foldLeft(0L)((a, b) => a + (b & 0xff))
        DecodedMedia(m.media_id, w, h, 1 + n / 256,
          if (n == 0) 0.0 else sum.toDouble / n)
      }
    }
  }

  /** Column-level feature extraction on the binary payload — byte count
    * and a strided byte-code checksum ("frame sampling": every `stride`-th
    * byte). Pure codegen-able expressions; the DuckDB oracle mirrors them
    * over the original text (ASCII corpus ⇒ byte == char code). */
  def byteFeatures(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("mime"),
      octet_length(col("content")).as("n_bytes"),
      // empty blobs: sequence(1, 0, step) throws; DuckDB's range(1,1,16)
      // yields an empty list and a NULL sum — match that with a guard.
      when(octet_length(col("content")) === 0, lit(null).cast("long"))
        .otherwise(aggregate(
          sequence(lit(1), octet_length(col("content")), lit(stride)),
          lit(0L),
          (acc, i) => acc +
            ascii(call_function("substr", col("content").cast("string"), i, lit(1)))))
        .as("sample_checksum"),
      (floor(octet_length(col("content")) / 64) + 1).as("n_frames"))
}
