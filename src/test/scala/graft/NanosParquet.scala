package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Test-only writer for a GENUINE parquet TIMESTAMP(NANOS) events file.
  * Spark has no nanosecond timestamp type and cannot produce one, so the
  * fixture goes through parquet-mr's example Group API directly — this is
  * what actually exercises `spark.sql.legacy.parquet.nanosAsLong` on a
  * nanos-ANNOTATED column (a plain INT64 would read as long regardless). */
object NanosParquet {
  val eventsSchema: MessageType = Types.buildMessage()
    .required(INT64).named("event_id")
    .required(INT64)
    .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
    .required(INT64).named("user_id")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
    .required(DOUBLE).named("value")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
    .named("events")

  /** rows: (event_id, ts NANOS since epoch, user_id, event_type, value, props) */
  def writeEvents(path: String,
                  rows: Seq[(Long, Long, Long, String, Double, String)],
                  conf: Configuration): Unit = {
    val writer = ExampleParquetWriter.builder(
      HadoopOutputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
      .withType(eventsSchema).build()
    val f = new SimpleGroupFactory(eventsSchema)
    try rows.foreach { case (id, ns, uid, et, v, p) =>
      writer.write(f.newGroup()
        .append("event_id", id).append("ts", ns).append("user_id", uid)
        .append("event_type", Binary.fromString(et)).append("value", v)
        .append("props", Binary.fromString(p)))
    } finally writer.close()
  }
}
