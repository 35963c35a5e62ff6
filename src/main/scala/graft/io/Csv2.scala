package graft.io

import org.apache.spark.sql.types.{DoubleType, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semicolon-CSV with decimal-comma locale — `read_csv2`/`write_csv2`
  * (SURVEY.md §2.1 S4/S9; e.g.
  * `/root/reference/src/export_from_fieldmap/query_fieldmap.Rmd:80`).
  *
  * Numeric columns arrive as "2,5" strings; we read them as strings
  * against the declared schema's names and cast after a single
  * regexp-free `replace` — column-pruned and codegen'd, no UDF. Schemas
  * are always supplied (never `inferSchema`) per SURVEY.md §1.3.
  */
object Csv2 {

  /** Read `path` with `schema`; DoubleType fields may use decimal commas. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val stringSchema = StructType(schema.fields.map(_.copy(dataType =
      org.apache.spark.sql.types.StringType)))
    val raw = spark.read
      .option("sep", ";").option("header", "true").option("nullValue", "")
      .schema(stringSchema)
      .csv(path)
    schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case DoubleType =>
          df.withColumn(f.name, translate(col(f.name), ",", ".").cast(DoubleType))
        case dt => df.withColumn(f.name, col(f.name).cast(dt))
      }
    }
  }

  /** Write with `;` separator (decimal points kept — the reference's
    * own `write_csv2` writes commas, but every downstream consumer in
    * the reference re-parses them; we standardize on points and note
    * the deviation). */
  def write(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("sep", ";").option("header", "true")
      .csv(path)
}
