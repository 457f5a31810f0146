"""MLlib layer: predictive model over the scored domain + KMeans-IVF ANN.

The north-star framing maps the reference's predictive-analytics role onto
Spark MLlib.  Two components:

* ``risk_model``  — a Pipeline (type one-hot + numeric assembler ->
  LinearRegression) trained to predict the engine's own risk scores from
  route features.  This is the "learned surrogate" of the kernel pipeline:
  at 100 TB you can score new routes without the accident cross join.
* ``ivf_index`` / ``ivf_search`` — inverted-file ANN: KMeans over the
  embedding corpus picks centroids; each vector is assigned to its nearest
  centroid (the IVF cell); a query probes only its cell(s) — the scalable
  upgrade of the LSH bucketing in operators/similarity.py.

Iterative algorithms are not SQL-expressible, so the driver applies the
weaker rows-only check to these queries (documented in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# NOTE: pyspark.ml imports live inside the functions that need them — a
# broken/absent MLlib in a consumer environment must not take down the
# __spark_entry__ import chain (only the 3 rows-only ML queries would fail).

from . import domain
from .operators import scoring
from .operators.similarity import (N_QUERIES, TOP_K, _dot, _norm,
                                   embeddings_df)

SEED = 42


def _route_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    routes = domain.routes_df(spark, sf_dir)
    locations = domain.locations_df(spark, sf_dir)
    return routes.join(F.broadcast(locations), "location_id").select(
        "route_id", "route_type", "latitude", "longitude",
        F.coalesce("elevation_m", F.lit(0.0)).alias("elevation_m"),
        F.coalesce("popularity", F.lit(0.0)).alias("popularity"),
    )


def risk_model_pipeline():
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import (OneHotEncoder, StringIndexer,
                                    VectorAssembler)
    from pyspark.ml.regression import LinearRegression
    idx = StringIndexer(inputCol="route_type", outputCol="type_idx",
                        handleInvalid="keep")
    ohe = OneHotEncoder(inputCols=["type_idx"], outputCols=["type_vec"])
    asm = VectorAssembler(
        inputCols=["type_vec", "latitude", "longitude", "elevation_m",
                   "popularity"],
        outputCol="features")
    lr = LinearRegression(featuresCol="features", labelCol="risk_score",
                          predictionCol="predicted_risk", regParam=0.1)
    return Pipeline(stages=[idx, ohe, asm, lr])


def q_ml_risk_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the surrogate on the engine's own scores; return per-route
    label vs prediction plus the global RMSE/R2 (constant columns)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    feats = _route_features(spark, sf_dir)
    labels = scoring.risk_scores_df(spark, sf_dir).select(
        "route_id", "risk_score")
    data = feats.join(labels, "route_id").cache()
    model = risk_model_pipeline().fit(data)
    pred = model.transform(data)
    rmse = RegressionEvaluator(labelCol="risk_score",
                               predictionCol="predicted_risk",
                               metricName="rmse").evaluate(pred)
    r2 = RegressionEvaluator(labelCol="risk_score",
                             predictionCol="predicted_risk",
                             metricName="r2").evaluate(pred)
    return (pred.select("route_id", "risk_score",
                        F.round("predicted_risk", 4).alias("predicted_risk"))
                .withColumn("rmse", F.round(F.lit(rmse), 4))
                .withColumn("r2", F.round(F.lit(r2), 4))
                .orderBy("route_id"))


# --- KMeans IVF ANN ----------------------------------------------------------

N_CENTROIDS = 16
N_PROBE = 2  # cells searched per query


def ivf_assignments(spark: SparkSession, sf_dir: str,
                    k: int = N_CENTROIDS):
    """Fit KMeans; return (model, corpus with cell assignment)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    e = embeddings_df(spark, sf_dir)
    vecs = e.withColumn("fvec", array_to_vector(F.col("vec")))
    km = KMeans(k=k, seed=SEED, featuresCol="fvec", predictionCol="cell")
    model = km.fit(vecs)
    return model, model.transform(vecs).drop("fvec")


def q_ann_ivf(spark: SparkSession, sf_dir: str,
              topk: int = TOP_K) -> DataFrame:
    """IVF search: each query probes its N_PROBE nearest centroids' cells
    only, then exact cosine within the probed cells."""
    model, corpus = ivf_assignments(spark, sf_dir)
    centroids = [(ci, [float(x) for x in c])
                 for ci, c in enumerate(model.clusterCenters())]
    cent_df = F.broadcast(corpus.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"))

    q = (corpus.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("vec").alias("qvec")))
    # rank centroids per query by euclidean distance; keep N_PROBE cells
    qc = q.crossJoin(cent_df)
    dist2 = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("centroid"),
                   lambda x, c: (x - c) * (x - c)),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("query_id").orderBy(dist2.asc(), F.col("cell").asc())
    probed = (qc.withColumn("cell_rank", F.row_number().over(w))
                .filter(F.col("cell_rank") <= N_PROBE)
                .select("query_id", "qvec", "cell"))
    cand = (corpus.join(probed, "cell")
                  .filter(F.col("vec_id") != F.col("query_id")))
    cos = _dot(F.col("vec"), F.col("qvec")) / (_norm(F.col("vec"))
                                               * _norm(F.col("qvec")))
    scored = cand.select("query_id", "vec_id", cos.alias("cosine"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w2))
                  .filter(F.col("rank") <= topk)
                  .select("query_id", F.col("rank").cast("int").alias("rank"),
                          F.col("vec_id").alias("neighbor_id"),
                          F.round("cosine", 6).alias("cosine"))
                  .orderBy("query_id", "rank"))


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster profile: size + centroid norm per IVF cell."""
    model, corpus = ivf_assignments(spark, sf_dir)
    norms = {ci: float(sum(x * x for x in c) ** 0.5)
             for ci, c in enumerate(model.clusterCenters())}
    sizes = corpus.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    norm_df = F.broadcast(corpus.sparkSession.createDataFrame(
        [(ci, n) for ci, n in norms.items()], "cell int, centroid_norm double"))
    return (sizes.join(norm_df, "cell")
                 .select("cell", "n_vectors",
                         F.round("centroid_norm", 4).alias("centroid_norm"))
                 .orderBy("cell"))
