package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.jdk.CollectionConverters._

/** Avro container interchange — the row-oriented sibling of the
  * ORC/parquet columnar formats and the de-facto lake/streaming
  * delivery format (Kafka dumps, CDC extracts, cross-engine handoffs
  * all arrive as `.avro` container files). The deployment's Spark jar
  * set carries avro-core but not the `spark-avro` connector, so this
  * source parses the container format DIRECTLY with the Avro
  * library's own reader over [[binaryFile]] shard bytes — which is
  * also the honest scale shape: an Avro container is block-compressed
  * per file, so parallelism is per shard FILE exactly like the
  * gzipped JSONL deliveries ([[Jsonl]]), and a corpus delivery is
  * thousands of shards, each one map task.
  *
  * Schemas are SUPPLIED (§1.3 — never inferred): the supplied
  * [[StructType]] becomes the Avro READER schema, so Avro's own
  * schema-resolution rules give column pruning and field reordering
  * against whatever writer schema each shard carries, and a shard
  * whose writer schema cannot resolve fails LOUDLY per file (the
  * S11/S12 precondition stance — a malformed container is a task
  * failure like ORC's, not a silent null row).
  *
  * Supported field types: the flat primitive set the interchange
  * tables use (long/int/double/float/string/boolean/binary), nullable
  * as `union(null, T)` — the standard Avro nullability encoding.
  */
object Avro {

  /** Avro schema for a flat primitive StructType (nullable fields as
    * the standard `union(null, T)`). */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported Avro interchange type for field '${f.name}': $other")
      }
      val s = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft.io", false, fields.toSeq.asJava)
  }

  /** Write `df` as deflate-compressed Avro container shards
    * (`part-NNNNN.avro`, one per non-empty partition) under `path`.
    * Attempt-unique temp names + rename keep retries/speculation from
    * interleaving partial files (the [[TokenShards]] writer stance). */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema).toString
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) require(fs.delete(root, true),
      s"failed to clear existing Avro dir $root")
    require(fs.mkdirs(root), s"failed to create Avro dir $root")
    // driver hadoop conf (spark.hadoop.* included) broadcast into the
    // writer tasks — the same channel every built-in Spark sink uses.
    val bc = df.sparkSession.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))

    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId(); val attempt = tc.taskAttemptId()
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(bc.value.value)
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".part-$pid%05d.avro.$attempt%d.tmp")
        val writer = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](schema))
          .setCodec(CodecFactory.deflateCodec(6))
          .create(schema, fs.create(tmp, true))
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < sparkSchema.length) {
              rec.put(i, toAvro(row.get(i), sparkSchema(i).dataType))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
        // publish CHECKED: rename/delete report failure by returning
        // false on RawLocalFileSystem et al. — an unpublished shard
        // must be a loud task failure, never a silent absence.
        val fin = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
        if (fs.exists(fin)) require(fs.delete(fin, false),
          s"failed to delete stale shard $fin before republish")
        require(fs.rename(tmp, fin),
          s"failed to publish shard $tmp -> $fin (fs.rename returned false)")
        ()
      }
    }
  }

  /** Read `.avro` container shards under `path` with the supplied
    * StructType as the Avro reader schema (pruning + reordering via
    * Avro schema resolution; unresolvable writer schemas fail the
    * task loudly). One map task per shard file. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import spark.implicits._
    val readerJson = avroSchema(schema).toString
    val fields = schema.fields
    // pathGlobFilter over the directory, not a glob path: a glob load
    // makes FileStreamSink.hasMetadata log a spurious full
    // FileNotFoundException stack trace at WARN on every read
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .rdd.flatMap { case (_, bytes) =>
        val reader = new GenericDatumReader[GenericRecord](
          null, new Schema.Parser().parse(readerJson))
        val file = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes), reader)
        val out = scala.collection.mutable.ArrayBuffer[Row]()
        try {
          while (file.hasNext) {
            val rec = file.next()
            out += Row.fromSeq(fields.indices.map(i =>
              fromAvro(rec.get(i), fields(i).dataType)))
          }
        } finally file.close()
        out
      }
    spark.createDataFrame(rows, schema)
  }

  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (x, _) => x
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (x, _) => x
  }
}
