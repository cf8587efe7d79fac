package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-assembly operators: deterministic splitting and sampling — the
  * bookkeeping half of a training-data pipeline. Everything is a pure
  * projection of a content-stable hash, so assignments are reproducible
  * run-to-run, survive repartitioning, and never reshuffle existing rows
  * when new data arrives (the property `randomSplit`'s seed-per-partition
  * sampling does NOT have).
  */
object Pipeline {

  /** Uniform in [0,1): the first 8 hex digits of md5(id) as a 32-bit
    * integer over 2^32. Division by a power of two is exact in IEEE
    * double, so the value — and every threshold comparison on it — is
    * bit-identical in any engine that can md5 a string.
    */
  private def hashUniform(id: org.apache.spark.sql.Column) =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Deterministic train/val/test split by id hash: train < trainFrac <=
    * val < trainFrac+valFrac <= test. Stable under corpus growth —
    * adding documents never moves an existing one between splits. All
    * input columns ride along (this ANNOTATES the corpus; filtering on
    * `split` is the select-a-partition action, symmetric with
    * [[sampleByHash]]).
    */
  def trainSplit(docs: DataFrame, trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      "fractions must leave room for a test split")
    require(!docs.columns.contains("u") && !docs.columns.contains("split"),
      "columns 'u'/'split' are reserved by trainSplit (withColumn would clobber them)")
    docs.withColumn("u", hashUniform(col("doc_id")))
      .withColumn("split",
        when(col("u") < trainFrac, "train")
          .when(col("u") < trainFrac + valFrac, "val")
          .otherwise("test"))
  }

  /** Deterministic Bernoulli sample: keep rows whose id-hash uniform
    * falls below `fraction` — the same primitive as [[trainSplit]] with
    * one threshold, usable as a reproducible corpus subsample.
    */
  def sampleByHash(docs: DataFrame, fraction: Double): DataFrame =
    docs.filter(hashUniform(col("doc_id")) < fraction)
}
