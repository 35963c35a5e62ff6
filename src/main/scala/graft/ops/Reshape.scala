package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide<->long reshapes — SURVEY.md §2.6 (R1-R5). The reference melts
  * every measurement block to tidy long form (`query_fieldmap.Rmd:255,
  * 417,476,718`) and pivots status tables wide (`HT31xx_LSVI.Rmd:252`).
  */
object Reshape {

  /** R1 `gather`/`pivot_longer`: wide -> (variable, value) long form.
    * Keeps NA rows like dplyr's `gather` default. Value columns are cast
    * to a common type by Spark's unpivot (caller casts first if mixed).
    * Narrow-transform only: no shuffle. */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
           varName: String = "variable", valName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valName)

  /** R2 `spread`/`pivot_wider` with an explicit level list. Passing the
    * levels avoids Spark's extra distinct-collection job AND keeps the
    * output schema static — both required at scale (a pivot without
    * levels scans the data twice). Missing cells -> null (dplyr default),
    * or `fill` when given. */
  def pivotWide(df: DataFrame, keys: Seq[String], pivotCol: String,
                levels: Seq[String], valueAgg: Column,
                fill: Option[Column] = None, prefix: String = ""): DataFrame = {
    val wide = df.groupBy(keys.map(col): _*).pivot(pivotCol, levels).agg(valueAgg)
    val renamed = levels.foldLeft(wide)((d, lv) => d.withColumnRenamed(lv, s"$prefix$lv"))
    fill match {
      case Some(f) => levels.foldLeft(renamed)((d, lv) =>
        d.withColumn(s"$prefix$lv", coalesce(col(s"$prefix$lv"), f)))
      case None => renamed
    }
  }

  /** R3 `pivot_wider` with multiple value columns (`values_from =
    * c(x, y, type)`, `process_external_data.Rmd:105`): one pivot pass,
    * flattened column names `<level>_<valueName>` like tidyr. */
  def pivotWideMulti(df: DataFrame, keys: Seq[String], pivotCol: String,
                     levels: Seq[String], aggs: Seq[(Column, String)]): DataFrame = {
    val wide = df.groupBy(keys.map(col): _*)
      .pivot(pivotCol, levels)
      .agg(aggs.head._1.as(aggs.head._2), aggs.tail.map { case (c, n) => c.as(n) }: _*)
    // spark names multi-agg pivot columns "<level>_<aggName>" already;
    // normalize to lowercase for a stable contract
    wide.columns.foldLeft(wide)((d, c) => d.withColumnRenamed(c, c.toLowerCase))
  }

  /** R4 `separate(col, into, sep)`: split one string column into fixed
    * parts (`query_fieldmap.Rmd:410`). Overflow parts are dropped,
    * missing parts become NULL — dplyr's default. */
  def separate(df: DataFrame, colName: String, into: Seq[String], sep: String): DataFrame = {
    val parts = split(col(colName), sep)
    into.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
      d.withColumn(name, get(parts, lit(i))) // get() -> NULL past the end (ANSI-safe)
    }
  }
}
