"""Trainable text-quality classifier — the learned counterpart of the
heuristic quality scores in ops/text.py.

The standard corpus-filtering recipe (GPT-3 / CCNet / Gopher data
pipelines): a LINEAR classifier over hashed unigram+bigram features
(the fastText shape) trained to separate a high-quality reference
sample from crawl text, whose probability becomes a per-document
quality score for filtering or mixture weighting (ops/pipeline.py).

Spark-first: tokenization, n-gramming, feature hashing, IDF and the
logistic regression all run as a pyspark.ml Pipeline — training is
Spark's distributed LBFGS over the hashed features, scoring is one
codegen-friendly model transform; no Python in the scoring loop
beyond the ml-lib kernels themselves. At 100 TB you train on a
sample (a classifier needs ~10^5-10^6 labeled rows, not the corpus)
and SCORE the full corpus with the broadcast model — exactly how the
published pipelines run it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_text_classifier(df: DataFrame, text_col: str = "text",
                          label_col: str = "label",
                          n_features: int = 1 << 18,
                          max_iter: int = 30, reg: float = 1e-4):
    """Fit the fastText-shaped pipeline: lowercased word tokens +
    word bigrams, each hashed into its own feature space, IDF-weighted,
    logistic regression on top. Returns the fitted PipelineModel
    (save/load via its own .save/.load)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (
        IDF, HashingTF, NGram, RegexTokenizer, VectorAssembler,
    )

    tok = RegexTokenizer(inputCol=text_col, outputCol="_words",
                         pattern="\\W+", toLowercase=True)
    big = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    tf1 = HashingTF(inputCol="_words", outputCol="_tf1",
                    numFeatures=n_features)
    tf2 = HashingTF(inputCol="_bigrams", outputCol="_tf2",
                    numFeatures=n_features)
    idf = IDF(inputCol="_tf1", outputCol="_idf1")
    asm = VectorAssembler(inputCols=["_idf1", "_tf2"], outputCol="_features")
    lr = LogisticRegression(featuresCol="_features", labelCol=label_col,
                            maxIter=max_iter, regParam=reg)
    pipe = Pipeline(stages=[tok, big, tf1, tf2, idf, asm, lr])
    return pipe.fit(df)


def score_text(df: DataFrame, model, text_col: str = "text",
               score_col: str = "quality_score") -> DataFrame:
    """Append the classifier's P(label=1) as ``score_col``; the
    intermediate feature columns are dropped. One distributed
    transform — the model broadcasts, the corpus streams."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df)
    return (out.withColumn(score_col,
                           F.round(vector_to_array("probability")[1], 6))
            .drop("_words", "_bigrams", "_tf1", "_tf2", "_idf1",
                  "_features", "rawPrediction", "probability", "prediction"))


def classifier_filter(df: DataFrame, model, text_col: str = "text",
                      threshold: float = 0.5) -> DataFrame:
    """Keep rows the classifier scores at or above ``threshold`` —
    the CCNet-style quality gate."""
    return (score_text(df, model, text_col)
            .where(F.col("quality_score") >= threshold))
