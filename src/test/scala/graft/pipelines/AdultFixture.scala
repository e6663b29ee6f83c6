package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

/** Deterministic UCI-Adult-FORMAT fixture at study scale (~32.5k raw rows,
  * ~30k after the '?'-null drop) for the golden end-to-end pipeline runs.
  *
  * The real Adult file is not redistributable inside this sandbox, so the
  * fixture is a seeded generator committed as code: marginal distributions
  * approximate the published Adult ones (workclass 70% Private, country
  * ~90% US, capital_gain ~92% zero, '?' rates on workclass / occupation /
  * native_country like the original's 5.6% / 5.7% / 1.8%), and a latent
  * "typical profile" mixture supplies the cross-column correlation that
  * makes ~20% of rows share k>=5 equivalence classes over the 10-QI set —
  * the regime the reference's published 77.93% suppression lives in.
  * Independent draws alone would make nearly every 10-QI combination
  * unique (suppression -> 100%) and the golden run would exercise nothing.
  *
  * Determinism: single java.util.Random stream (algorithm fixed by its
  * spec), sequential draws, fixed row count — same seed, same rows, on
  * any JVM.
  */
object AdultFixture {

  private def pick[T](r: Random, dist: Seq[(T, Double)]): T = {
    val x = r.nextDouble()
    var acc = 0.0
    val it = dist.iterator
    while (it.hasNext) {
      val (v, w) = it.next()
      acc += w
      if (x < acc) return v
    }
    dist.last._1
  }

  // Marginals approximating the published Adult distributions. "?" encodes
  // the missing marker exactly as the source file does.
  private val workclassDist = Seq(
    "Private" -> 0.697, "Self-emp-not-inc" -> 0.079, "Local-gov" -> 0.065,
    "?" -> 0.056, "State-gov" -> 0.040, "Self-emp-inc" -> 0.034,
    "Federal-gov" -> 0.029)
  private val educationDist = Seq(
    ("HS-grad", 9) -> 0.323, ("Some-college", 10) -> 0.223,
    ("Bachelors", 13) -> 0.164, ("Masters", 14) -> 0.054,
    ("Assoc-voc", 11) -> 0.042, ("11th", 7) -> 0.036,
    ("Assoc-acdm", 12) -> 0.033, ("10th", 6) -> 0.028,
    ("7th-8th", 4) -> 0.020, ("Prof-school", 15) -> 0.018,
    ("9th", 5) -> 0.016, ("12th", 8) -> 0.013, ("Doctorate", 16) -> 0.012,
    ("5th-6th", 3) -> 0.010, ("1st-4th", 2) -> 0.005, ("Preschool", 1) -> 0.003)
  private val maritalDist = Seq(
    "Married-civ-spouse" -> 0.460, "Never-married" -> 0.328,
    "Divorced" -> 0.136, "Separated" -> 0.031, "Widowed" -> 0.030,
    "Married-spouse-absent" -> 0.013, "Married-AF-spouse" -> 0.002)
  private val occupationDist = Seq(
    "Prof-specialty" -> 0.127, "Craft-repair" -> 0.126,
    "Exec-managerial" -> 0.125, "Adm-clerical" -> 0.116, "Sales" -> 0.112,
    "Other-service" -> 0.101, "Machine-op-inspct" -> 0.062, "?" -> 0.057,
    "Transport-moving" -> 0.049, "Handlers-cleaners" -> 0.042,
    "Farming-fishing" -> 0.031, "Tech-support" -> 0.029,
    "Protective-serv" -> 0.020, "Priv-house-serv" -> 0.007)
  private val relationshipDist = Seq(
    "Husband" -> 0.405, "Not-in-family" -> 0.255, "Own-child" -> 0.155,
    "Unmarried" -> 0.106, "Wife" -> 0.048, "Other-relative" -> 0.031)
  private val raceDist = Seq(
    "White" -> 0.854, "Black" -> 0.096, "Asian-Pac-Islander" -> 0.032,
    "Amer-Indian-Eskimo" -> 0.010, "Other" -> 0.008)
  private val sexDist = Seq("Male" -> 0.669, "Female" -> 0.331)
  private val countryDist = Seq(
    "United-States" -> 0.895, "Mexico" -> 0.020, "?" -> 0.018,
    "Philippines" -> 0.006, "Germany" -> 0.004, "Canada" -> 0.004,
    "Puerto-Rico" -> 0.004, "El-Salvador" -> 0.003, "India" -> 0.003,
    "Cuba" -> 0.003, "England" -> 0.003, "Jamaica" -> 0.003,
    "South" -> 0.003, "China" -> 0.003, "Italy" -> 0.002,
    "Dominican-Republic" -> 0.002, "Vietnam" -> 0.002, "Guatemala" -> 0.002,
    "Japan" -> 0.002, "Poland" -> 0.002, "Columbia" -> 0.002,
    "Taiwan" -> 0.002, "Haiti" -> 0.002, "Iran" -> 0.001,
    "Portugal" -> 0.001, "Nicaragua" -> 0.001, "Peru" -> 0.001,
    "France" -> 0.001, "Greece" -> 0.001, "Ecuador" -> 0.001)
  private val gainValues = Seq(2174, 3103, 4386, 5013, 5178, 7298, 7688,
    8614, 9386, 10520, 13550, 14084, 15024, 99999)
  private val lossValues = Seq(1408, 1485, 1590, 1602, 1672, 1740, 1848,
    1887, 1902, 1977, 2415)
  private val hoursDist = Seq(
    40 -> 0.470, 50 -> 0.090, 45 -> 0.060, 60 -> 0.050, 35 -> 0.040,
    30 -> 0.050, 20 -> 0.040, 25 -> 0.030, 55 -> 0.020, 38 -> 0.020,
    48 -> 0.015, 15 -> 0.015, 70 -> 0.010, 10 -> 0.010)

  // The "typical profile" core: restricted domains whose 10-QI product
  // space (~1,200 cells) concentrates coreFraction of the rows, so
  // equivalence classes of size >= 5 exist at study scale.
  private val coreFraction = 0.16
  private val coreEducation = Seq(
    ("HS-grad", 9) -> 0.50, ("Some-college", 10) -> 0.30, ("Bachelors", 13) -> 0.20)
  private val coreMarital = Seq("Married-civ-spouse" -> 0.55, "Never-married" -> 0.45)
  private val coreOccupation = Seq(
    "Craft-repair" -> 0.25, "Adm-clerical" -> 0.22, "Sales" -> 0.20,
    "Other-service" -> 0.18, "Exec-managerial" -> 0.15)

  final case class AdultRow(
      age: Int, workclass: String, fnlwgt: Int, education: String,
      education_num: Int, marital_status: String, occupation: String,
      relationship: String, race: String, sex: String, capital_gain: Int,
      capital_loss: Int, hours_per_week: Int, native_country: String,
      income: String)

  def rows(nRows: Int = 32561, seed: Long = 42L): Seq[AdultRow] = {
    val r = new Random(seed)
    (1 to nRows).map { _ =>
      val core = r.nextDouble() < coreFraction
      val (edu, eduNum) = if (core) pick(r, coreEducation) else pick(r, educationDist)
      val age =
        if (core) 23 + r.nextInt(20)
        else math.max(17, math.min(90, (38.6 + r.nextGaussian() * 13.6).round.toInt))
      val marital = if (core) pick(r, coreMarital) else pick(r, maritalDist)
      AdultRow(
        age = age,
        workclass = if (core) "Private" else pick(r, workclassDist),
        fnlwgt = 10000 + r.nextInt(990000),
        education = edu,
        education_num = eduNum,
        marital_status = marital,
        occupation = if (core) pick(r, coreOccupation) else pick(r, occupationDist),
        relationship =
          if (marital == "Married-civ-spouse") pick(r, Seq("Husband" -> 0.82, "Wife" -> 0.18))
          else pick(r, Seq("Not-in-family" -> 0.47, "Own-child" -> 0.28,
            "Unmarried" -> 0.19, "Other-relative" -> 0.06)),
        race = if (core) "White" else pick(r, raceDist),
        sex = pick(r, sexDist),
        capital_gain =
          if (core || r.nextDouble() < 0.917) 0
          else gainValues(r.nextInt(gainValues.size)),
        capital_loss =
          if (core || r.nextDouble() < 0.953) 0
          else lossValues(r.nextInt(lossValues.size)),
        hours_per_week = pick(r, hoursDist),
        native_country = if (core) "United-States" else pick(r, countryDist),
        income = if (r.nextDouble() < 0.241) ">50K" else "<=50K")
    }
  }

  /** The fixture as a DataFrame with '?' markers still in place (the CSV
    * writer maps them to the null marker; AdultSchema.load parses them
    * back to null and drops those rows — the study's exact load path). */
  def raw(spark: SparkSession, nRows: Int = 32561, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    // '?' strings become real nulls here so CsvSource.write emits the
    // study's missing marker
    rows(nRows, seed).toDF()
      .na.replace(Seq("workclass", "occupation", "native_country"), Map("?" -> null))
  }
}
