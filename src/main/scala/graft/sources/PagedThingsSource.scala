package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for a paged observations API — SURVEY §2.1 S5 (the
  * SensorThings REST source, SamenMetenTools/SamenMetenThings.py:1409-1470:
  * `@iot.nextLink` page loop, `$filter=phenomenonTime ge/lt`,
  * parallelised by the MyWorkers pool :261-487).
  *
  * Spark-native shape: one [[InputPartition]] PER PAGE, so the cluster
  * fetches pages in parallel — the executor-side generalisation of the
  * reference's 4-thread worker pool — and each reader streams its page
  * without materialising the whole datastream on the driver.
  *
  * The transport is STUBBED (zero-egress container): a deterministic
  * in-process "server" synthesises each page from (datastream, page,
  * seed), standing in for the HTTP GET; everything Spark-side — schema,
  * options, partition planning, per-partition readers, row encoding — is
  * the real machinery a production endpoint would use.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.PagedThingsSource")
  *     .option("datastreams", "101,102")   // one per sensor datastream
  *     .option("pages", "4")               // pages per datastream
  *     .option("pageSize", "100")
  *     .load()
  * }}}
  */
class PagedThingsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedThingsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PagedThingsTable(properties.asScala.toMap)
}

object PagedThingsSource {
  val schema: StructType = StructType(Seq(
    StructField("datastream_id", LongType, nullable = false),
    StructField("phenomenon_time", LongType, nullable = false), // epoch s
    StructField("result", DoubleType, nullable = false),
    StructField("page", IntegerType, nullable = false)))

  /** The stubbed remote: deterministic page payload. A real endpoint
    * would HTTP-GET `…/Datastreams(id)/Observations?$skip=page·size`. */
  def fetchPage(datastream: Long, page: Int, pageSize: Int): Seq[(Long, Double)] =
    (0 until pageSize).map { i =>
      val t = 1700000000L + (page.toLong * pageSize + i) * 60
      // value derived from a portable mix of (datastream, index)
      val v = ((datastream * 31 + page * pageSize + i) % 1000) / 10.0
      (t, v)
    }
}

private class PagedThingsTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "paged_things"
  override def schema(): StructType = PagedThingsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = PagedThingsSource.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val streams = options.getOrDefault("datastreams", "1")
            .split(",").map(_.trim.toLong)
          val pages = options.getOrDefault("pages", "1").toInt
          val pageSize = options.getOrDefault("pageSize", "100").toInt
          // one partition per (datastream, page): the parallel-fetch unit
          streams.flatMap(ds => (0 until pages).map(p =>
            PagePartition(ds, p, pageSize): InputPartition)).toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new PageReaderFactory
      }
    }
}

private case class PagePartition(datastream: Long, page: Int, pageSize: Int)
    extends InputPartition

private class PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private val rows =
        PagedThingsSource.fetchPage(p.datastream, p.page, p.pageSize).iterator
      private var current: (Long, Double) = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        current = rows.next(); true
      }
      override def get(): InternalRow =
        InternalRow(p.datastream, current._1, current._2, p.page)
      override def close(): Unit = ()
    }
  }
}
