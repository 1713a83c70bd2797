package graft.connect

import java.util
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-process DataSource-v2 double for the Kafka connector (VERDICT r4
  * #5): emits the connector's EXACT 7-column envelope
  * (key/value/topic/partition/offset/timestamp/timestampType — the read
  * schema of the real `kafka` format, reference
  * kafka_connector.py:168-189) from deterministic in-memory data, and
  * accepts batch/streaming writes under the `value`-column contract.
  *
  * The point is NOT to fake a broker — it is that the REAL
  * [[Sources]]/[[Sinks]] kafka branches (option construction through
  * [[KafkaOptions]], `.load()`, value-contract enforcement, mandatory
  * checkpoint) execute end-to-end with only the format name swapped at
  * the one factory seam (`spark.graft.kafka.format`). Everything the
  * suite proves — envelope schema, option passthrough, offset ordering,
  * tombstones, B1/B2/B4 on top — holds for the real connector because
  * no production line is test-aware.
  *
  * Fixture: 2 partitions × 5 offsets; keys cycle u0/u1/u2 within each
  * partition so latest-per-key compaction is non-trivial; (p1, o4) is a
  * TOMBSTONE (null value) for delete semantics; timestamps are distinct
  * and deterministic.
  */
object TestKafkaSource {
  val Topic = "contract-topic"
  val NumPartitions = 2
  val OffsetsPerPartition = 5

  /** options the provider last saw on the READ path, for passthrough
    * assertions (captured per JVM — tests run single-session).
    */
  @volatile var lastReadOptions: Map[String, String] = Map.empty
  /** options last seen on a write path (batch or streaming). */
  @volatile var lastWriteOptions: Map[String, String] = Map.empty
  /** every `value` written through either write path, in commit order. */
  val written = new ConcurrentLinkedQueue[String]()

  def reset(): Unit = {
    lastReadOptions = Map.empty
    lastWriteOptions = Map.empty
    written.clear()
  }

  /** The Kafka source read schema, field for field. */
  val Envelope: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private val BaseSec = 1700000000L

  def keyAt(p: Int, off: Int): String = s"u${off % 3}"
  def isTombstone(p: Int, off: Int): Boolean = p == 1 && off == 4
  def valueAt(p: Int, off: Int): Option[String] =
    if (isTombstone(p, off)) None else Some(s"p$p-o$off-${keyAt(p, off)}")
  def tsMicros(p: Int, off: Int): Long =
    (BaseSec + p * 100L + off) * 1000000L

  private[connect] def rowAt(p: Int, off: Int): InternalRow =
    new GenericInternalRow(Array[Any](
      keyAt(p, off).getBytes("UTF-8"),
      valueAt(p, off).map(_.getBytes("UTF-8")).orNull,
      UTF8String.fromString(Topic),
      p,
      off.toLong,
      tsMicros(p, off),
      0))
}

/** The provider class the factory's `.format(...)` resolves by name. */
class TestKafkaSource extends TableProvider with CreatableRelationProvider {
  import TestKafkaSource._

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    lastReadOptions = options.asScala.toMap
    Envelope
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TestKafkaTable

  /** V1 batch write — the same seam the real Kafka sink uses for
    * `df.write.format("kafka").save()` (its batch path is a
    * CreatableRelationProvider too, which is what makes default
    * ErrorIfExists mode work without table-catalog semantics).
    */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    lastWriteOptions = parameters
    val idx = data.schema.fieldIndex("value")
    data.collect().foreach { r =>
      if (!r.isNullAt(idx)) written.add(r.get(idx) match {
        case b: Array[Byte] => new String(b, "UTF-8")
        case s              => s.toString
      })
    }
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }
}

class TestKafkaTable extends Table with SupportsRead with SupportsWrite {
  import TestKafkaSource._

  override def name(): String = "test-kafka"
  override def schema(): StructType = Envelope
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    lastReadOptions = options.asScala.toMap
    new ScanBuilder {
      override def build(): Scan = new TestKafkaScan
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    lastWriteOptions = info.options().asScala.toMap
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new TestKafkaStreamingWrite(schema)
      }
    }
  }
}

class TestKafkaScan extends Scan {
  import TestKafkaSource._

  override def readSchema(): StructType = Envelope

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      (0 until NumPartitions)
        .map(p => TestKafkaPartition(p, 0, OffsetsPerPartition): InputPartition)
        .toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new TestKafkaReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      override def initialOffset(): Offset = TestKafkaOffset(0)
      override def latestOffset(): Offset = TestKafkaOffset(OffsetsPerPartition)
      override def deserializeOffset(json: String): Offset =
        TestKafkaOffset(json.trim.toInt)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val a = start.asInstanceOf[TestKafkaOffset].upTo
        val b = end.asInstanceOf[TestKafkaOffset].upTo
        if (a >= b) Array.empty
        else (0 until NumPartitions)
          .map(p => TestKafkaPartition(p, a, b): InputPartition).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new TestKafkaReaderFactory
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

/** Stream offset: per-partition high-watermark (all partitions advance
  * together in the fixture).
  */
case class TestKafkaOffset(upTo: Int) extends Offset {
  override def json(): String = upTo.toString
}

case class TestKafkaPartition(p: Int, from: Int, until: Int) extends InputPartition

class TestKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val tp = partition.asInstanceOf[TestKafkaPartition]
    new PartitionReader[InternalRow] {
      private var off = tp.from - 1
      override def next(): Boolean = { off += 1; off < tp.until }
      override def get(): InternalRow = TestKafkaSource.rowAt(tp.p, off)
      override def close(): Unit = ()
    }
  }
}

/** V2 streaming write: collects the `value` column of every epoch on
  * commit (writer → commit message → driver), like a broker would see.
  */
class TestKafkaStreamingWrite(schema: StructType) extends StreamingWrite {
  private val idx = schema.fieldIndex("value")
  private val isBinary = schema(idx).dataType == BinaryType

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new TestKafkaStreamWriterFactory(idx, isBinary)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TestKafkaWriterMessage(vs) => vs.foreach(TestKafkaSource.written.add)
      case _                          => ()
    }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

case class TestKafkaWriterMessage(values: Seq[String]) extends WriterCommitMessage

class TestKafkaStreamWriterFactory(idx: Int, isBinary: Boolean)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      override def write(row: InternalRow): Unit =
        if (!row.isNullAt(idx)) buf +=
          (if (isBinary) new String(row.getBinary(idx), "UTF-8")
           else row.getUTF8String(idx).toString)
      override def commit(): WriterCommitMessage = TestKafkaWriterMessage(buf.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
