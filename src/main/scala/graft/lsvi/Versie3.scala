package graft.lsvi

import graft.pipelines.Inboveg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The REAL LSVI "Versie 3" rule content for the aquatic habitat types
  * (3110/3130/3140/3150/3160/2190), shipped as data (SURVEY.md §7.4
  * hard part 1: the reference fetches this from the rules module's
  * database via `geefInvoervereisten`/`geefSoortenlijst`,
  * `/root/reference/src/export_from_inboveg/HT31xx_LSVI.Rmd:49-60`).
  *
  * Everything observable in the reference is encoded verbatim:
  *   - the var_code -> (criterium, indicator, voorwaarde, type) mapping
  *     (`HT31xx_LSVI.Rmd:85-108`, `invoervereisten_join`);
  *   - the class -> value mapping for horst/chara/7140o/verst
  *     (`HT31xx_LSVI.Rmd:140-149`), with the documented midpoint
  *     interpretation for the horst class ranges ("als tussenoplossing
  *     wordt voorlopig het midden van de klassengrenzen gebruikt");
  *   - the VZuSS/Vzuur substitution for 3160 sites and the removal of
  *     plain Vzuur there (`HT31xx_LSVI.Rmd:117-124`);
  *   - LOQ halving for below-LOQ numerics (`HT31xx_LSVI.Rmd:129-132`);
  *   - taxon-name canonicalization (Chara hispida L. -> Chara major,
  *     Warnstorfia fluitans (Hedw.) Loeske -> Warnstorfia fluitans
  *     groep, `HT31xx_LSVI.Rmd:169-180`);
  *   - the per-habitattype (criterium, indicator, belang) skeleton,
  *     read off the published result table
  *     (`processed/lsvi_mhq/standing_water/result/status_indicatoren_sw.tsv`).
  *
  * Numeric thresholds (ref_numeric) are module parameters the reference
  * pulls from the LSVI database; they are encoded here as swappable data
  * rows — the verified contract is the rule SHAPES (joins, class
  * mapping, verdict ops, aggregation), which the q77/q78 oracle checks
  * end-to-end.
  */
object Versie3 {

  val habitattypes: Seq[String] = Seq("3110", "3130", "3140", "3150", "3160", "2190")

  /** `invoervereisten_join` (HT31xx_LSVI.Rmd:85-108): INBOVEG var_code
    * -> rules-module coordinates. */
  val invoervereistenJoin: Seq[(String, String, String, String, String)] = Seq(
    ("horst", "Structuur", "horizontale structuur", "grootste vegetatievlek in m²", "Decimaal getal"),
    ("7140o", "Structuur", "horizontale structuur", "contact met 7110 of 7140_oli", "Ja/nee"),
    ("Subm",  "Structuur", "horizontale structuur", "bedekking submerse vegetatie", "Percentage"),
    ("Chara", "Structuur", "horizontale structuur", "bedekking kranswieren", "Percentage"),
    ("Helo",  "Structuur", "verticale structuur", "bedekking helofyten", "Percentage"),
    ("HabVl", "Structuur", "verticale structuur", "% begroeid met opgaande vegetatie", "Percentage"),
    ("verst", "Structuur", "verticale structuur", "aandeel isoëtiden > overige groeivormen", "Ja/nee"),
    ("BooOv", "Structuur", "bedekking overhangende bomen en struiken", "bedekking overhangende bomen en struiken", "Percentage"),
    ("MonoR", "Structuur", "robuuste monocotylen", "bedekking robuuste monocotylen", "Percentage"),
    ("Boom",  "Structuur", "verbossing", "bedekking verbossing", "Percentage"),
    ("Eutro", "Verstoring", "eutrofiëring", "bedekking eutrofiëring", "Percentage"),
    ("Invas", "Verstoring", "invasieve exoten", "bedekking invasieve exoten", "Percentage"),
    ("Vzuur", "Verstoring", "verzuring", "bedekking verzuring", "Percentage"),
    ("chara", "Vegetatie", "sleutelsoorten", "kranswiervelden voor > = 50 % sleutelsoorten", "Ja/nee"))

  /** Class-coded field values -> module values (HT31xx_LSVI.Rmd:140-149).
    * `mapped` is the reference's verbatim string; `mappedNumeric` the
    * value the verdict evaluator uses (horst ranges -> midpoints). */
  val classValueMap: Seq[(String, String, String, Double)] = Seq(
    ("horst", "g10m²", "10.01-20", 15.005),
    ("horst", "10m2",  "1-10",     5.5),
    ("horst", "1m2",   "0-0.99",   0.495),
    ("chara", "49ss",  "0", 0.0),
    ("chara", "51ss",  "1", 1.0),
    ("7140o", "ja",    "1", 1.0),
    ("7140o", "nee",   "0", 0.0),
    ("verst", "gisoe", "1", 1.0),
    ("verst", "kisoe", "0", 0.0))

  /** Taxon canonicalization (HT31xx_LSVI.Rmd:169-180). */
  val taxonCanonical: Seq[(String, String)] = Seq(
    ("Chara hispida L.", "Chara major"),
    ("Warnstorfia fluitans (Hedw.) Loeske", "Warnstorfia fluitans groep"))

  /** Key-species lists per habitattype (the shape `geefSoortenlijst`
    * returns; characteristic taxa of each type). */
  val soortenlijst: Seq[(String, String)] = Seq(
    ("3110", "Isoetes echinospora"), ("3110", "Littorella uniflora"),
    ("3110", "Lobelia dortmanna"),
    ("3130", "Littorella uniflora"), ("3130", "Juncus bulbosus"),
    ("3130", "Hypericum elodes"),
    ("3140", "Chara major"), ("3140", "Chara globularis"),
    ("3140", "Nitella flexilis"),
    ("3150", "Stratiotes aloides"), ("3150", "Hydrocharis morsus-ranae"),
    ("3150", "Utricularia vulgaris"),
    ("3160", "Sphagnum cuspidatum"), ("3160", "Utricularia minor"),
    ("3160", "Warnstorfia fluitans groep"),
    ("2190", "Samolus valerandi"), ("2190", "Baldellia ranunculoides"),
    ("2190", "Chara major"))

  /** TANSLEY MEREN cover codes -> percentage midpoints (the
    * `Invoertype = "TANSLEY MEREN"` scale, HT31xx_LSVI.Rmd:183). */
  val tansleyCover: Seq[(String, Int)] = Seq(
    ("d", 75), ("cd", 55), ("a", 35), ("f", 15), ("o", 5), ("r", 1))

  /** The Versie-3 rule rows: (habitattype, criterium, indicator,
    * voorwaarde, belang, op, ref_numeric). Indicator sets and belang per
    * habitattype exactly as published in status_indicatoren_sw.tsv;
    * voorwaarde membership per invoervereistenJoin; thresholds are
    * module-parameter data. */
  val rules: Seq[(String, String, String, String, String, String, Double)] = {
    def r(ht: String, crit: String, ind: String, vw: String, belang: String,
          op: String, ref: Double) = (ht, crit, ind, vw, belang, op, ref)
    val all = habitattypes
    val horst = all.map(ht => r(ht, "Structuur", "horizontale structuur",
      "grootste vegetatievlek in m²", "zb", ">=", 10.0))
    val contact = Seq(r("3160", "Structuur", "horizontale structuur",
      "contact met 7110 of 7140_oli", "zb", "=", 1.0))
    val subm = Seq("3110", "3130", "3140", "3150").map(ht =>
      r(ht, "Structuur", "horizontale structuur", "bedekking submerse vegetatie",
        "zb", ">=", 25.0))
    val kranswier = Seq(r("3140", "Structuur", "horizontale structuur",
      "bedekking kranswieren", "zb", ">=", 50.0))
    val vertical = Seq("3110", "3130", "3140", "3150").flatMap(ht => Seq(
      r(ht, "Structuur", "verticale structuur", "bedekking helofyten", "zb", "<=", 30.0),
      r(ht, "Structuur", "verticale structuur", "% begroeid met opgaande vegetatie",
        "zb", "<=", 30.0)))
    val isoet = Seq(r("3110", "Structuur", "verticale structuur",
      "aandeel isoëtiden > overige groeivormen", "zb", "=", 1.0))
    val dunes = Seq(
      r("2190", "Structuur", "bedekking overhangende bomen en struiken",
        "bedekking overhangende bomen en struiken", "zb", "<=", 30.0),
      r("2190", "Structuur", "robuuste monocotylen",
        "bedekking robuuste monocotylen", "zb", "<=", 10.0),
      r("2190", "Structuur", "verbossing", "bedekking verbossing", "zb", "<=", 10.0))
    val eutro = all.map(ht =>
      r(ht, "Verstoring", "eutrofiëring", "bedekking eutrofiëring", "zb", "<=", 10.0))
    val invas = all.map(ht =>
      r(ht, "Verstoring", "invasieve exoten", "bedekking invasieve exoten", "zb", "<=", 10.0))
    val vzuur = Seq("3110", "3130", "3160").map(ht =>
      r(ht, "Verstoring", "verzuring", "bedekking verzuring", "zb", "<=", 10.0))
    val sleutel = Seq("3110", "3130", "3140", "3150", "3160").map(ht =>
      r(ht, "Vegetatie", "sleutelsoorten", "aandeel sleutelsoorten", "b", ">=", 50.0)) ++
      Seq(r("2190", "Vegetatie", "bedekking sleutelsoorten",
        "aandeel sleutelsoorten", "b", ">=", 50.0)) ++
      Seq(r("3140", "Vegetatie", "sleutelsoorten",
        "kranswiervelden voor > = 50 % sleutelsoorten", "b", "=", 1.0))
    horst ++ contact ++ subm ++ kranswier ++ vertical ++ isoet ++ dunes ++
      eutro ++ invas ++ vzuur ++ sleutel
  }

  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rules.toDF("habitattype", "criterium", "indicator", "voorwaarde",
        "belang", "op", "ref_numeric")
      .withColumn("ref_categories", lit(null).cast("array<string>"))
  }

  private def invoervereistenDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    invoervereistenJoin.toDF("var_code", "criterium", "indicator", "voorwaarde", "typ")
  }

  private def classMapDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    classValueMap.toDF("var_code", "class_value", "mapped", "mapped_numeric")
  }

  /** data_voorwaarden construction (HT31xx_LSVI.Rmd:110-152).
    *
    * `habitat`: (id, habitattype); `siteCharacteristics`:
    * (id, var_code, value) with raw string values — decimal-comma
    * numerics with optional LOQ markers, or class codes.
    * Returns (id, habitattype, voorwaarde, value_numeric,
    * value_category).
    *
    * Deviation from the reference, documented: unmapped var_codes are
    * dropped by the inner dictionary join (the reference left-joins and
    * lets the external module ignore NULL-voorwaarde rows). */
  def prepareVoorwaarden(habitat: DataFrame, siteCharacteristics: DataFrame): DataFrame = {
    val spark = habitat.sparkSession
    val sc = siteCharacteristics
      .join(habitat.select("id", "habitattype"), Seq("id"))
      // 3160: the VZuSS measurement IS the verzuring value; plain Vzuur
      // (incl. pitrus) is not relevant for Versie 3 there
      .where(!(col("var_code") === "Vzuur" && col("habitattype") === "3160"))
      .withColumn("var_code",
        when(col("var_code") === "VZuSS" && col("habitattype") === "3160", "Vzuur")
          .otherwise(col("var_code")))
      .where(col("var_code") =!= "VZuSS")
    val parsed = Inboveg.loqAdjusted(Inboveg.parseStructureValues(sc))
    val vereisten = invoervereistenDf(spark).select("var_code", "voorwaarde")
    // SINGLE CHAIN over `parsed` (one numeric + one class-coded stream
    // used to union, re-planning the habitat-join subtree — and its
    // base scans — twice; r13): the class dictionary rides as one
    // broadcast left join keyed (var_code, class value), numeric rows
    // pass through it unmatched, and the branch choice collapses into
    // a `when`. A class-coded row with no dictionary match drops, a
    // numeric row never does — exactly the old inner/`where` split.
    val cm = classMapDf(spark).withColumnRenamed("var_code", "cm_var_code")
    parsed
      .join(broadcast(cm),
        col("var_code") === col("cm_var_code") &&
          trim(col("value")) === col("class_value"), "left_outer")
      .where(col("is_numeric") || col("mapped_numeric").isNotNull)
      .join(broadcast(vereisten), Seq("var_code"))
      .select(col("id"), col("habitattype"), col("voorwaarde"),
        when(col("is_numeric"), col("value_adjusted"))
          .otherwise(col("mapped_numeric")).as("value_numeric"),
        lit(null).cast("string").as("value_category"))
  }

  /** data_soortenkenmerken (HT31xx_LSVI.Rmd:169-185): canonicalized
    * species cover per recording. `vegetation`: (id, name, cover_code). */
  def soortenKenmerken(vegetation: DataFrame): DataFrame = {
    val canon = taxonCanonical.foldLeft(col("name")) { case (c, (from, to)) =>
      when(col("name") === from, to).otherwise(c)
    }
    vegetation.select(col("id"), canon.as("kenmerk"), col("cover_code").as("waarde"))
  }

  /** Soortenkenmerken aggregation: TANSLEY cover codes -> percentages,
    * key-species share per recording as the "aandeel sleutelsoorten"
    * voorwaarde value. Returns the same shape as [[prepareVoorwaarden]]
    * so the two streams union into data_voorwaarden. */
  def sleutelsoortenVoorwaarden(habitat: DataFrame, kenmerken: DataFrame): DataFrame = {
    val spark = habitat.sparkSession
    import spark.implicits._
    val covers = tansleyCover.toDF("waarde", "pct")
    val lijst = soortenlijst.toDF("habitattype", "kenmerk")
      .withColumn("is_sleutelsoort", lit(true))
    kenmerken
      .join(habitat.select("id", "habitattype"), Seq("id"))
      .join(broadcast(covers), Seq("waarde"))
      .join(broadcast(lijst), Seq("habitattype", "kenmerk"), "left_outer")
      .groupBy("id", "habitattype")
      .agg(round(lit(100.0) * sum(when(col("is_sleutelsoort"), col("pct")).otherwise(0)) /
        sum(col("pct")), 6).as("value_numeric"))
      .select(col("id"), col("habitattype"),
        lit("aandeel sleutelsoorten").as("voorwaarde"),
        col("value_numeric"), lit(null).cast("string").as("value_category"))
  }

  /** Full Versie-3 scoring: compose voorwaarden + soortenkenmerken
    * streams, join the per-habitattype rule table, run the generic
    * engine. Returns (detail, indicator, criterium, globaal). */
  def score(habitat: DataFrame, siteCharacteristics: DataFrame,
            vegetation: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val spark = habitat.sparkSession
    val measurements = prepareVoorwaarden(habitat, siteCharacteristics)
      .unionByName(sleutelsoortenVoorwaarden(habitat, soortenKenmerken(vegetation)))
    val d = Lsvi.detailByType(measurements, rulesDf(spark))
    val i = Lsvi.indicator(d)
    (d, i, Lsvi.criterium(i), Lsvi.globaal(i))
  }
}
