package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The reference's RandomForest mortality model (nb:cell26; app variant
  * Health_Jim.py:648-722) on MLlib — SURVEY §2.8 M1-M8.
  *
  * Parity notes:
  *  - one-hot matches pandas `get_dummies(drop_first=True)`: levels in
  *    alphabetical order, first level dropped, explicit 0/1 columns (no
  *    StringIndexer frequency ordering — SURVEY M2);
  *  - sklearn's seeded permutation split and our deterministic
  *    `xxhash64(Record_ID) % 100` split select different rows, so parity
  *    is a metric band (R² ≈ 0.785 published; we assert [0.70, 0.85] —
  *    SURVEY M3). Unlike `randomSplit`, the hash split is invariant
  *    under row order and partitioning, so the band is STABLE;
  *  - RF mapping: n_estimators→numTrees, max_depth→maxDepth,
  *    min_samples_leaf→minInstancesPerNode; sklearn regression default
  *    max_features=1.0 → featureSubsetStrategy="all" (M4).
  */
object MortalityModel {

  val label = "Mortality_Rate_per_100"
  val dropCols: Seq[String] = Seq(
    "Row_num", "Record_ID", "Country_Population", "Year",
    "Improvement_5_Years", "Country")
  val leakyCols: Seq[String] = Seq("Severity Score", "DALYs", "Recovery_Rate")
  val catCols: Seq[String] = Seq(
    "Disease Name", "Vaccine_Treatment_Availability", "Treatment_Type")

  final case class Fitted(
      model: RandomForestRegressionModel,
      featureNames: Seq[String],
      train: DataFrame,
      test: DataFrame)

  /** pandas get_dummies(drop_first=True): alphabetical levels minus the
    * first, as explicit 0/1 double columns named `col_level`. The level
    * inventory is tiny (≤21) — collecting it is fit-time metadata, like
    * StringIndexer.fit. `Record_ID` is retained (excluded from features)
    * as the deterministic split key.
    */
  def encode(df: DataFrame): (DataFrame, Seq[String]) = {
    // Level inventory for all categoricals in ONE aggregate pass (a
    // per-column distinct().collect() is one full-table job per column).
    val levelRow = df.agg(
      collect_set(col(s"`${catCols.head}`")),
      catCols.tail.map(c => collect_set(col(s"`$c`"))): _*).head()
    val levelsByCol = catCols.zipWithIndex.map { case (c, i) =>
      c -> levelRow.getSeq[String](i).sorted.drop(1) // drop_first
    }
    var out = df.drop(dropCols.filterNot(_ == "Record_ID"): _*)
    val dummyNames = levelsByCol.flatMap { case (c, levels) =>
      levels.map { lvl =>
        val name = s"${c}_$lvl"
        out = out.withColumn(name, when(col(s"`$c`") === lvl, 1.0).otherwise(0.0))
        name
      }
    }
    (out.drop(catCols: _*), dummyNames)
  }

  /** Deterministic train/test split: hash the stable row id, not the row
    * POSITION. `randomSplit` is per-partition Bernoulli sampling — which
    * rows land where depends on partitioning and row order, so any ETL
    * replan silently reshuffles the split (and the metrics). Hashing
    * `Record_ID` (SURVEY §2.8 M3) assigns every row a split side that is
    * invariant under row order, partitioning, and cluster size — the same
    * property sklearn gets from its seeded permutation of a fixed-order
    * frame. Parity with sklearn remains a metric band either way (the
    * selected rows differ).
    */
  private def hashSplit(assembled: DataFrame, trainPct: Int): (DataFrame, DataFrame) = {
    val side = pmod(xxhash64(col("__rid")), lit(100))
    (assembled.filter(side < trainPct).drop("__rid"),
     assembled.filter(side >= trainPct).drop("__rid"))
  }

  /** M1-M4 — encode, deterministic 76/24 split, fit RF 300×3×leaf5. */
  def fit(df: DataFrame): Fitted = {
    val (encoded, dummies) = encode(df)
    val numericFeatures = encoded.schema.fields
      .filter(f => f.dataType == DoubleType || f.dataType == LongType)
      .map(_.name)
      .filterNot((Seq(label, "Record_ID") ++ leakyCols ++ dummies).contains)
    val featureNames = numericFeatures.toSeq ++ dummies
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("features")
      .transform(encoded.select(
        (featureNames.map(c => col(s"`$c`").cast(DoubleType).as(c)) :+
          col(s"`$label`").as("label") :+ col("Record_ID").as("__rid")): _*))
    val (train, test) = hashSplit(assembled, 76)
    val rf = new RandomForestRegressor()
      .setNumTrees(300).setMaxDepth(3).setMinInstancesPerNode(5)
      .setFeatureSubsetStrategy("all").setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
    Fitted(rf.fit(train), featureNames, train, test)
  }

  /** The APP variant (Health_Jim.py:648-690): 16 named numeric features
    * — including the leaky `Severity Score` (0.7·label + …) and `DALYs`,
    * which the notebook variant deliberately drops — no one-hot, split
    * 0.8/0.2 seed 42. Reproduced as-is: the leak is part of the app's
    * observed behavior, so its R² is near 1.
    */
  val appFeatures: Seq[String] = Seq(
    "Incidence_Rate_per_million", "Prevalence_Rate", "Population_Affected",
    "DALYs", "Severity Score", "Improvement_5_Years", "Healthcare_Access_Pct",
    "Doctors_per_1000", "Hospital_Beds_per_1000", "Population Coverage (%)",
    "Health_Index", "Per_Capita_Income_USD", "Education_Index",
    "Urban_Population_Pct", "Rural_Population_Pct", "Urbanization_Rate")

  def fitAppVariant(df: DataFrame): Fitted = {
    val names = appFeatures.filter(df.columns.contains)
    val assembled = new VectorAssembler()
      .setInputCols(names.toArray).setOutputCol("features")
      .transform(df.select(
        (names.map(c => col(s"`$c`").cast(DoubleType).as(c)) :+
          col(s"`$label`").as("label") :+ col("Record_ID").as("__rid")): _*))
    val (train, test) = hashSplit(assembled, 80)
    val rf = new RandomForestRegressor()
      .setNumTrees(300).setMaxDepth(3).setMinInstancesPerNode(5)
      .setFeatureSubsetStrategy("all").setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
    Fitted(rf.fit(train), names, train, test)
  }

  /** M5 — r2 / mae / mse on a split, as a 1-row DataFrame. */
  def metrics(fitted: Fitted, onTest: Boolean = true): DataFrame = {
    val data = if (onTest) fitted.test else fitted.train
    val pred = fitted.model.transform(data)
    val spark = data.sparkSession
    import spark.implicits._
    val ev = new RegressionEvaluator().setLabelCol("label").setPredictionCol("prediction")
    Seq((
      ev.setMetricName("r2").evaluate(pred),
      ev.setMetricName("mse").evaluate(pred),
      ev.setMetricName("mae").evaluate(pred)
    )).toDF("r2", "mse", "mae")
  }

  /** M6 — feature importances, sorted desc (Health_Jim.py:713-722). */
  def featureImportances(fitted: Fitted): DataFrame = {
    val spark = fitted.train.sparkSession
    import spark.implicits._
    fitted.featureNames.zip(fitted.model.featureImportances.toArray)
      .toDF("feature", "importance")
      .orderBy(col("importance").desc, col("feature").asc)
  }

  /** M7 — single-row scoring with median fallback for unspecified
    * features (Health_Jim.py:728-744): absent keys default to the
    * TRAINING median of that feature; column order matches training.
    */
  def predictOne(fitted: Fitted, inputs: Map[String, Double]): Double = {
    val spark = fitted.train.sparkSession
    val medianExprs = fitted.featureNames.zipWithIndex.map { case (c, i) =>
      expr(s"percentile(`$c`, 0.5)").as(s"m$i")
    }
    // medians come from one 1-row aggregate over the training frame
    val meds = {
      val arr = org.apache.spark.ml.functions.vector_to_array(col("features"))
      val flat = fitted.train.select(fitted.featureNames.zipWithIndex.map {
        case (c, i) => element_at(arr, i + 1).as(c)
      }: _*)
      flat.agg(medianExprs.head, medianExprs.tail: _*).head()
    }
    val values = fitted.featureNames.zipWithIndex.map { case (c, i) =>
      inputs.getOrElse(c, meds.getDouble(i))
    }
    val row = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        org.apache.spark.ml.linalg.Vectors.dense(values.toArray))),
      new org.apache.spark.sql.types.StructType()
        .add("features", org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
    fitted.model.transform(row).select("prediction").head().getDouble(0)
  }
}
