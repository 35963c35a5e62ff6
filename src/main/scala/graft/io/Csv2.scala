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

  /** The corrupt-line capture column appended by [[readAudit]]
    * (shared name with [[Jsonl.CorruptCol]] — one audit convention
    * across the interchange sources). */
  val CorruptCol: String = Jsonl.CorruptCol

  /** [[read]] with the [[Jsonl.read]] PERMISSIVE audit contract: a
    * malformed line (token count ≠ schema width, broken quoting)
    * lands WHOLE in a `_corrupt_record` column with every data column
    * null, so one torn line in a delivery cannot kill the ingest job;
    * the caller audits `_corrupt_record IS NOT NULL` rows and
    * decides. Decimal-comma doubles cast exactly as [[read]] — on
    * CLEAN rows only: unlike the JSON parser, Spark's CSV PERMISSIVE
    * mode still fills the leading tokens of a malformed line into
    * data columns, so the casts are explicitly gated on the corrupt
    * flag (otherwise a stray token like "row" in a double column
    * kills the task under ANSI casting — the exact failure the audit
    * mode exists to absorb). */
  def readAudit(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"supplied schema must not already contain $CorruptCol")
    val stringSchema = StructType(schema.fields.map(_.copy(dataType =
      org.apache.spark.sql.types.StringType)) :+
      org.apache.spark.sql.types.StructField(CorruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read
      .option("sep", ";").option("header", "true").option("nullValue", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      // malformedness must be judged against the FULL supplied schema:
      // under column pruning the parser only sees the projected
      // positions, so a 7-token line against a 5-column schema stops
      // being "malformed" the moment a downstream aggregate prunes —
      // the corrupt flag would silently flip with the query shape
      .option("columnPruning", "false")
      .schema(stringSchema)
      .csv(path)
    schema.fields.foldLeft(raw) { (df, f) =>
      val clean = col(CorruptCol).isNull
      f.dataType match {
        case DoubleType =>
          df.withColumn(f.name, when(clean,
            translate(col(f.name), ",", ".").cast(DoubleType)))
        case dt => df.withColumn(f.name, when(clean, col(f.name).cast(dt)))
      }
    }
  }

  /** [[read]] failing LOUDLY on the first malformed line (FAILFAST) —
    * the S11/S12 precondition stance for pipelines that must not
    * proceed past a torn delivery. */
  def readStrict(spark: SparkSession, path: String,
                 schema: StructType): DataFrame = {
    val stringSchema = StructType(schema.fields.map(_.copy(dataType =
      org.apache.spark.sql.types.StringType)))
    val raw = spark.read
      .option("sep", ";").option("header", "true").option("nullValue", "")
      .option("mode", "FAILFAST")
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

  /** Single-FILE `;`-CSV with TRUE decimal commas — the `write_csv2`
    * output format of the published `*_dikdoodhout.csv` twins
    * (`processed/lsvi_mhq/forests/result/status_dikdoodhout.csv`:
    * `1,6114;1,0281;...`, nulls as `NA`). Double columns render
    * `%.(digits)f` with a comma decimal mark; the frame is written
    * pre-sorted by the caller. Result-table sized (dictionary rows),
    * so the single-partition collapse is the S9 output contract, not
    * a scale concern. */
  def writeFile(df: DataFrame, file: String, digits: Int = 4,
                naString: String = "NA"): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val out = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case DoubleType => d.withColumn(f.name,
          when(col(f.name).isNotNull,
            translate(format_string(s"%.${digits}f", col(f.name)), ".", ",")))
        case _ => d
      }
    }
    val tmp = file + ".tmp"
    out.coalesce(1).write.mode("overwrite")
      .option("sep", ";").option("header", "true").option("nullValue", naString)
      .csv(tmp)
    val listing = Files.list(Paths.get(tmp))
    val part =
      try listing.filter(_.getFileName.toString.startsWith("part-"))
        .findFirst().orElseThrow(() =>
          new IllegalStateException(s"no part file under $tmp"))
      finally listing.close()
    Files.createDirectories(Paths.get(file).toAbsolutePath.getParent)
    Files.move(part, Paths.get(file), StandardCopyOption.REPLACE_EXISTING)
    Files.walk(Paths.get(tmp))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
  }
}
