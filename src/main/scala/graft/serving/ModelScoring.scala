package graft.serving

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-inference scoring — the reference loads a pickled sklearn
  * RandomForest from Blob and calls `predict` on a single feature row
  * (`PGSITE/__init__.py:82-96,361-370`). Spark-native form: a Spark ML
  * `RandomForestClassificationModel` whose `transform` runs distributed —
  * the model broadcasts once to executors and scoring is a map-side
  * operation, so throughput scales with the cluster instead of one
  * driver-side `predict` per HTTP request.
  */
object ModelScoring {

  /** Train a classifier on (features: array<float|double>, label: int) —
    * stands in for the reference's externally-trained pickle. */
  def trainOnArrays(df: DataFrame, arrayCol: String, labelCol: String,
      numTrees: Int = 20, seed: Long = 42L): RandomForestClassificationModel =
    new RandomForestClassifier()
      .setNumTrees(numTrees)
      .setSeed(seed)
      .setFeaturesCol("features")
      .setLabelCol(labelCol)
      .fit(df.withColumn("features",
        array_to_vector(transform(col(arrayCol), x => x.cast("double")))))

  /** Score rows with an array feature column; appends `prediction`. */
  def score(model: RandomForestClassificationModel, df: DataFrame,
      arrayCol: String): DataFrame =
    model.transform(df.withColumn("features",
        array_to_vector(transform(col(arrayCol), x => x.cast("double")))))
      .drop("features", "rawPrediction", "probability")
}
