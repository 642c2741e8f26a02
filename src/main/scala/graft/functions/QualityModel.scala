package graft.functions

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Learned quality filtering — the model-based stage of a curation
 * pipeline (the fastText-classifier pattern of GPT-3/CCNet-style
 * pipelines, reduced to public Spark MLlib): train a logistic regression
 * over the SAME per-document quality features the heuristic filters use
 * ([[TextFunctions.qualityMetrics]]), then score the corpus with a
 * calibrated keep-probability.
 *
 * Scale shape: feature extraction is the narrow codegen'd expression set
 * of t01/t02 (no UDFs); MLlib's LBFGS trains via `treeAggregate`
 * gradient passes (each iteration is one partial-aggregated pass, no
 * per-row driver traffic) and the driver state is one coefficient vector
 * of |features| doubles. Scoring is a per-row dot product — a narrow
 * map, streaming-safe.
 */
object QualityModel {

  /** Feature order is part of the model contract. */
  val FeatureCols: Seq[String] = Seq("n_chars", "n_tokens", "n_punct",
    "n_digits", "n_stopwords", "stopword_ratio", "mean_word_len")

  /** Attach the quality feature columns (doubles) to `df`. */
  def withFeatures(df: DataFrame, textCol: String): DataFrame =
    TextFunctions.qualityMetrics(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c.cast("double"))
    }

  private def assemble(df: DataFrame): DataFrame =
    new VectorAssembler().setInputCols(FeatureCols.toArray)
      .setOutputCol("__features").transform(df)

  /** Train on a frame that already carries [[FeatureCols]] and a 0/1
   * double `labelCol`. Tiny L2 keeps the separable-data optimum finite. */
  def train(labeled: DataFrame, labelCol: String = "label",
      maxIter: Int = 200): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(1e-6)
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .fit(assemble(labeled))

  /** Score: adds `quality_prob` (P(label=1)) and `quality_pred`. */
  def score(df: DataFrame, model: LogisticRegressionModel): DataFrame = {
    val scored = model.setFeaturesCol("__features")
      .setPredictionCol("quality_pred")
      .setProbabilityCol("__prob")
      .setRawPredictionCol("__raw")
      .transform(assemble(df))
    scored
      .withColumn("quality_prob",
        org.apache.spark.ml.functions.vector_to_array(col("__prob"))(1))
      .drop("__features", "__prob", "__raw")
  }
}
