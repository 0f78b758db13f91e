package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the hashed bag-of-tokens
  * logistic regression every published curation pipeline runs (GPT-3's
  * WebText-vs-CommonCrawl quality filter, Brown et al. 2020 §A;
  * CCNet's fastText stand-in, Wenzek et al. 2020): positives are a
  * known-good reference corpus, negatives the raw crawl, and the
  * learned token weights score every candidate document. The heuristic
  * gates ([[TextAnalysis.qualityTable]], [[Curation.run]]) are
  * zero-shot; this is the data-driven sibling for when a reference
  * corpus exists, and its score is exactly the kind of column
  * `Curation.run(extraGates = ...)` gates on.
  *
  * Scale shape: featurization is one per-row hashed-count vector (no
  * vocabulary build, no shuffle — the classic hashing trick); training
  * cost is LBFGS over tree-aggregated gradients, executor-bound, the
  * only driver state the (numFeatures)-long weight vector; scoring
  * BROADCASTS that weight vector and is a per-row sparse dot product —
  * no shuffle, no state, safe at any corpus size. 2^18 features × 8 B
  * = a 2 MB broadcast.
  */
object QualityModel {

  /** Hashed token-count features for `text` (the hashing trick: no
    * vocabulary pass, collisions are part of the model). */
  private def featurize(docs: DataFrame, numFeatures: Int): DataFrame =
    new HashingTF().setInputCol("_toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(graft.sources.Tables.widen(docs)
        .withColumn("_toks", TextAnalysis.tokens(col("text"))))
      .drop("_toks")

  /** Fit the classifier: `positives` = reference-quality documents,
    * `negatives` = raw/rejected documents; both need a `text` column.
    * L2 regularization keeps hash-collided features from blowing up.
    */
  def train(positives: DataFrame, negatives: DataFrame,
      numFeatures: Int = 1 << 18, maxIter: Int = 20,
      regParam: Double = 1e-4): LogisticRegressionModel = {
    val data = featurize(
      positives.select(col("text")).withColumn("label", lit(1.0))
        .unionByName(negatives.select(col("text")).withColumn("label", lit(0.0))),
      numFeatures)
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(data)
  }

  /** Score documents: original columns + `quality_score` (P(label=1))
    * and `quality_pred` (0/1 at the 0.5 threshold). Pure per-row math
    * against the broadcast weights — no shuffle.
    */
  def score(docs: DataFrame, model: LogisticRegressionModel): DataFrame =
    model.transform(featurize(docs, model.numFeatures))
      .withColumn("quality_score", vector_to_array(col("probability"))(1))
      .withColumn("quality_pred", col("prediction").cast("int"))
      .drop("features", "rawPrediction", "probability", "prediction")

  /** Persist / reopen (spark.ml native format — numFeatures and
    * weights ride the model metadata, so a reopened model refuses
    * nothing silently: `score` featurizes with the stored width). */
  def save(model: LogisticRegressionModel, dir: String): Unit =
    model.write.overwrite().save(dir)

  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): LogisticRegressionModel =
    LogisticRegressionModel.load(dir)
}
