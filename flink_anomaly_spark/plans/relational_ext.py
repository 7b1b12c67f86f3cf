"""Extended relational coverage: sliding/session windows, pivot,
intersect/except, as-of join, interval (range) join, LSH-bucketed ANN,
embedding near-dup — the operator families a Flink user would reach for
next, all Spark-first and oracle-exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_anomaly_spark.operators.relational import asof_join, interval_self_join
from flink_anomaly_spark.operators.similarity import (
    embedding_near_dup_pairs,
    hyperplane_matrix,
    lsh_bucketed_topk,
)
from flink_anomaly_spark.operators.windows import session_agg, sliding_agg
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table

# ---------------------------------------------------------------------------
# Sliding (hopping) window — absent from the reference (§2.7 note), free
# in Spark
# ---------------------------------------------------------------------------


@register(
    "sliding_window_agg",
    oracle="""
    WITH e AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS s1, value FROM events)
    SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM (SELECT s1 AS window_start, value FROM e
          UNION ALL
          SELECT s1 - INTERVAL 30 MINUTE AS window_start, value FROM e) t
    GROUP BY window_start
    """,
    doc="1h window / 30min slide: Spark expands each row into dur/slide "
    "windows then hash-aggregates (map-side partial agg keeps the "
    "shuffle at |windows| rows).",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sliding_agg(
        events,
        ts_col="ts",
        duration="1 hour",
        slide="30 minutes",
        aggs=[F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )


# ---------------------------------------------------------------------------
# Session window
# ---------------------------------------------------------------------------


@register(
    "session_window_agg",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT min(ts) AS window_start,
           max(ts) + INTERVAL 30 MINUTE AS window_end,
           user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    doc="Gap-based session windows (30 min) per user — F.session_window "
    "in batch; the oracle sessionizes via lag+cumsum (new session when "
    "gap ≥ 30 min, matching Spark's exclusive window end).",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return session_agg(
        events,
        ts_col="ts",
        gap="30 minutes",
        key_cols=["user_id"],
        aggs=[F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------


@register(
    "pivot_order_status",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (priority × status revenue matrix) — Catalyst rewrites to "
    "a single hash agg with conditional aggregates; explicit value list "
    "avoids the extra distinct-values job at scale.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


# ---------------------------------------------------------------------------
# Intersect / Except (set semantics — distinct, per SQL standard)
# ---------------------------------------------------------------------------


@register(
    "custkeys_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="INTERSECT (customers with both a finished and an open order) — "
    "Spark plans a left-semi join over distinct inputs.",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o)


@register(
    "custkeys_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="EXCEPT (set semantics — subtract, not the multiset exceptAll) — "
    "left-anti join over distinct inputs.",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(o)


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


@register(
    "asof_last_signup",
    oracle="""
    SELECT event_id, user_id,
           m.__rts AS last_signup_ts, m.sid AS last_signup_id
    FROM (
      SELECT event_id, user_id,
             max(CASE WHEN event_type = 'signup'
                      THEN {'__rts': ts, 'sid': event_id} END)
               OVER (PARTITION BY user_id
                     ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      FROM events) t
    """,
    doc="As-of join (Spark lacks a native one): each event matched to "
    "the latest signup at-or-before it per user. Implemented as "
    "union-tag + running max(struct) window — ONE shuffle total, no "
    "per-group pandas, no merge_asof (operators/relational.asof_join).",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup")
    out = asof_join(
        events,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
        out_prefix="asof_",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("last_signup_ts"),
        F.col("asof_event_id").alias("last_signup_id"),
    )


# ---------------------------------------------------------------------------
# Interval (range) self-join
# ---------------------------------------------------------------------------


@register(
    "interval_event_pairs",
    oracle="""
    SELECT a.user_id AS user_id, a.event_id AS id1, b.event_id AS id2,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE epoch_us(b.ts) - epoch_us(a.ts) > 0
      AND epoch_us(b.ts) - epoch_us(a.ts) <= 600000000
    """,
    doc="Range join (pairs of events ≤ 10 min apart per user) via time "
    "bucketization: equi-join on (key, bucket)∪(key, bucket+1) + "
    "residual filter — two hash joins instead of an O(n²) theta join "
    "(operators/relational.interval_self_join).",
)
def q_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return interval_self_join(
        events, key="user_id", ts_col="ts", id_col="event_id", max_gap_seconds=600
    )


# ---------------------------------------------------------------------------
# LSH-bucketed approximate nearest neighbors
# ---------------------------------------------------------------------------

_N_PLANES = 4
_DIM = 64


def _pair_dot(a: str, b: str) -> str:
    """DuckDB dot product with the same left-to-right fold as
    similarity.dot (F.zip_with + F.aggregate) — bit-identical doubles."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {_DIM + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x,y) -> x+y)"
    )


def _bucket_sql(vec: str = "embedding") -> str:
    """Random-hyperplane LSH bucket id in SQL — same planes and fold
    order as similarity.lsh_bucket, bit-identical bucket values."""
    planes = hyperplane_matrix(_N_PLANES, _DIM)

    def dot_sql(v: str, w: list[float]) -> str:
        wlit = "[" + ",".join(f"{x:.1f}" for x in w) + "]"
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {_DIM + 1}), "
            f"i -> CAST({v}[i] AS DOUBLE) * ({wlit}::DOUBLE[])[i])), (a,b) -> a+b)"
        )

    return " + ".join(
        f"(CASE WHEN {dot_sql(vec, w)} >= 0 THEN {1 << j} ELSE 0 END)"
        for j, w in enumerate(planes)
    )


def _ann_oracle() -> str:
    bucket = _bucket_sql()
    pair_dot = _pair_dot

    return f"""
    WITH v AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
         q AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM v WHERE vec_id < 10),
         c AS (SELECT vec_id AS nid, embedding AS nvec, bucket FROM v),
         scored AS (
           SELECT qid, nid,
                  round({pair_dot("qvec", "nvec")}
                        / (sqrt({pair_dot("qvec", "qvec")}) * sqrt({pair_dot("nvec", "nvec")})), 6)
                    AS cos_sim
           FROM c JOIN q USING (bucket) WHERE nid != qid)
    SELECT qid, nid, cos_sim, rank FROM (
      SELECT qid, nid, cos_sim,
             row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid ASC) AS rank
      FROM scored) t
    WHERE rank <= 5
    """


@register(
    "embedding_ann_lsh",
    oracle=_ann_oracle(),
    doc="Approximate NN via random-hyperplane LSH (4 deterministic "
    "md5-seeded planes → 16 buckets) + exact cosine rerank within the "
    "query's bucket — the 100 TB path: each query scores |corpus|/16 "
    "candidates in expectation (brute_force_topk is the exact baseline).",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(
        emb, id_col="vec_id", vec_col="embedding", query_ids=list(range(10)), k=5,
        n_planes=_N_PLANES,
    )


def _ivf_oracle(n_cells: int = 8, stride: int = 7, n_probe: int = 2) -> str:
    def cos_sql(a: str, b: str) -> str:
        return (
            f"{_pair_dot(a, b)} / "
            f"(sqrt({_pair_dot(a, a)}) * sqrt({_pair_dot(b, b)}))"
        )

    return f"""
    WITH cent AS (
      SELECT c.cell, e.embedding AS cvec
      FROM embeddings e JOIN (SELECT unnest(range(0, {n_cells})) AS cell) c
        ON e.vec_id = c.cell * {stride}
    ),
    assign AS (
      SELECT vec_id AS nid, embedding AS nvec, cell FROM (
        SELECT v.vec_id, v.embedding, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cos_sql("v.embedding", "c.cvec")} DESC, c.cell ASC) AS rn
        FROM embeddings v CROSS JOIN cent c) t
      WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS qid, embedding AS qvec, cell FROM (
        SELECT v.vec_id, v.embedding, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cos_sql("v.embedding", "c.cvec")} DESC, c.cell ASC) AS rn
        FROM embeddings v CROSS JOIN cent c
        WHERE v.vec_id < 10) t
      WHERE rn <= {n_probe}
    ),
    scored AS (
      SELECT qid, nid, round({cos_sql("qvec", "nvec")}, 6) AS cos_sim
      FROM probe q JOIN assign n USING (cell) WHERE nid != qid
    )
    SELECT qid, nid, cos_sim, rank FROM (
      SELECT qid, nid, cos_sim,
             row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid ASC) AS rank
      FROM scored) t
    WHERE rank <= 5
    """


_IVF_CENTROID_IDS = [7 * c for c in range(8)]
#: Index-build cache keyed by (sf_dir, mtime_ns, size) of the underlying
#: embeddings.parquet — NOT by path alone: the testdata at a fixed path
#: is regenerated between driver rounds, and a path-keyed cache in a
#: long-lived process would assign cells from stale centroid vectors and
#: silently diverge from the oracle. os.stat of the file is ~µs next to
#: the collect it saves.
_IVF_CENTROID_CACHE: dict[tuple[str, int, int], list[list[float]]] = {}


def _ivf_cache_key(sf_dir: str) -> tuple[str, int, int]:
    import os

    try:
        st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
        return (sf_dir, st.st_mtime_ns, st.st_size)
    except OSError:  # non-file source (e.g. a test fixture dir) — no reuse
        return (sf_dir, -1, -1)


@register(
    "embedding_ann_ivf",
    oracle=_ivf_oracle(),
    doc="Approximate NN via an IVF-flat index (FAISS-style inverted "
    "file): 8 deterministic sampled centroids inlined as literals → "
    "narrow no-shuffle cell assignment over the corpus; each query "
    "probes its 2 nearest cells and exact-cosine reranks — at 100 TB "
    "each query touches |corpus|/4 rows instead of the full scan.",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import collect_centroids, ivf_flat_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # index build (centroid collect) and probe are separate phases of an
    # IVF deployment — cache the 8 collected vectors per corpus so
    # repeated query construction (bench loop, driver reruns) doesn't
    # re-run the build scan. Keyed by (path, mtime, size) so a testdata
    # regeneration at the same path invalidates the entry.
    key = _ivf_cache_key(sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE.clear()  # bound growth: one corpus at a time
        _IVF_CENTROID_CACHE[key] = collect_centroids(
            emb, "vec_id", "embedding", _IVF_CENTROID_IDS
        )
    return ivf_flat_topk(
        emb, id_col="vec_id", vec_col="embedding", query_ids=list(range(10)), k=5,
        centroid_ids=_IVF_CENTROID_IDS, centroids=_IVF_CENTROID_CACHE[key],
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------


def _near_dup_oracle() -> str:
    cos = (
        f"{_pair_dot('a.embedding', 'b.embedding')} / "
        f"(sqrt({_pair_dot('a.embedding', 'a.embedding')}) * "
        f"sqrt({_pair_dot('b.embedding', 'b.embedding')}))"
    )
    return f"""
    SELECT a.vec_id AS id1, b.vec_id AS id2, round({cos}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({cos}, 6) >= 0.3
    """


@register(
    "embedding_near_dup",
    oracle=_near_dup_oracle(),
    doc="Embedding-cosine near-dup pairs blocked by label (cos ≥ 0.3) — "
    "the embedding flavor of dedup; at scale the block key is an LSH "
    "bucket.",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.3
    )


def _near_dup_lsh_oracle() -> str:
    cos = (
        f"{_pair_dot('a.embedding', 'b.embedding')} / "
        f"(sqrt({_pair_dot('a.embedding', 'a.embedding')}) * "
        f"sqrt({_pair_dot('b.embedding', 'b.embedding')}))"
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings)
    SELECT a.vec_id AS id1, b.vec_id AS id2, round({cos}, 6) AS cos_sim
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({cos}, 6) >= 0.3
    """


@register(
    "embedding_near_dup_lsh",
    oracle=_near_dup_lsh_oracle(),
    doc="Embedding-cosine near-dup pairs with the LSH bucket AS the "
    "blocking key — the 100 TB shape of embedding_near_dup: bucket "
    "count (2^4, tunable) bounds join parallelism and per-block pair "
    "cost independent of any data column; deterministic buckets make "
    "the approximate result exactly reproducible in the oracle.",
)
def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import embedding_near_dup_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_lsh(emb, id_col="vec_id", vec_col="embedding", threshold=0.3)


def _semdedup_oracle() -> str:
    cos = (
        f"{_pair_dot('a.embedding', 'b.embedding')} / "
        f"(sqrt({_pair_dot('a.embedding', 'a.embedding')}) * "
        f"sqrt({_pair_dot('b.embedding', 'b.embedding')}))"
    )
    return f"""
    WITH RECURSIVE
    v AS (SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round({cos}, 6) >= 0.3
    ),
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION
      SELECT id2 AS src, id1 AS dst FROM pairs
    ),
    reach(node, lab) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.src, r.lab FROM reach r JOIN edges e ON r.node = e.dst
    ),
    cl AS (SELECT node AS vec_id, min(lab) AS cluster_id FROM reach GROUP BY node)
    SELECT vec_id, cluster_id,
           CAST(vec_id = cluster_id AS INT) AS is_survivor
    FROM cl
    """


@register(
    "semdedup_survivors",
    oracle=_semdedup_oracle(),
    doc="SemDeDup (Abbas et al. 2023, 'SemDeDup: Data-efficient "
    "learning at web-scale through semantic deduplication') as a "
    "TRANSFORM: embedding near-duplicate groups collapse to one kept "
    "representative per group. Pairs come from the LSH-bucketed cosine "
    "join (embedding_near_dup_lsh — bucket count bounds pair cost at "
    "100 TB), transitive groups from the large/small-star connected "
    "components, and the survivor is the MIN vec_id of each component "
    "(deterministic canonical — SemDeDup keeps one random member; min "
    "id is the order-free equivalent). Emits every vector with its "
    "cluster and a 0/1 is_survivor flag, so the keep-list AND the "
    "drop-list are both one filter away. Oracle: same LSH pairs + "
    "recursive-CTE min-reachable-id components.",
)
def q_semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.dedup import connected_components
    from flink_anomaly_spark.operators.similarity import embedding_near_dup_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_lsh(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.3
    )
    nodes = emb.select(F.col("vec_id").alias("id"))
    # algorithm="star" (r12 optimization): the LSH-bucket cosine graph
    # at threshold 0.3 is DEEP — measured at sf0.1, min-label
    # propagation needs 15 rounds (diameter-shaped), so the default
    # auto mode burns its 6 label-prop rounds (12 corpus-proportional
    # shuffles) before escalating. The star contraction converges in
    # O(log d) alternations regardless of depth; measured 10.9 s (auto)
    # vs 5.7 s (star) warm on this graph with hash-identical output
    # (the two algorithms are equivalence-property-tested). The shallow
    # doc-minhash graphs keep auto — label-prop wins there.
    cc = connected_components(pairs.select("id1", "id2"), nodes, algorithm="star")
    return cc.select(
        F.col("id").alias("vec_id"),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).cast("int").alias("is_survivor"),
    )


def _semantic_decontam_oracle() -> str:
    cos = (
        f"{_pair_dot('c.embedding', 'e.embedding')} / "
        f"(sqrt({_pair_dot('c.embedding', 'c.embedding')}) * "
        f"sqrt({_pair_dot('e.embedding', 'e.embedding')}))"
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings),
    c AS (SELECT * FROM v WHERE vec_id % 20 != 0),
    e AS (SELECT * FROM v WHERE vec_id % 20 = 0),
    p AS (
      SELECT c.vec_id, e.vec_id AS eid, round({cos}, 6) AS cs
      FROM c JOIN e ON c.bucket = e.bucket
      WHERE round({cos}, 6) >= 0.3
    )
    SELECT vec_id, eid AS closest_eval_id, cs AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cs DESC, eid ASC) AS rn FROM p)
    WHERE rn = 1
    """


@register(
    "semantic_decontamination",
    oracle=_semantic_decontam_oracle(),
    doc="Embedding-level decontamination (the semantic complement of "
    "ngram_decontamination): corpus vectors within cosine 0.3 of any "
    "eval-set vector (deterministic eval split: vec_id % 20 == 0), "
    "candidate-joined on the shared LSH bucket so per-row cost is "
    "|eval|/2^4 in expectation; reports each contaminated vector's "
    "closest eval item. Catches paraphrased benchmark leakage that "
    "shares no n-gram with the original.",
)
def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import semantic_decontamination

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_decontamination(
        emb.filter(F.col("vec_id") % 20 != 0),
        emb.filter(F.col("vec_id") % 20 == 0),
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.3,
    )


# ---------------------------------------------------------------------------
# Time-series OHLC downsampling
# ---------------------------------------------------------------------------


@register(
    "ohlc_resample",
    oracle="""
    WITH b AS (
      SELECT event_type, time_bucket(INTERVAL '1 minute', ts) AS bucket_start,
             ts, event_id, value
      FROM events
    ), w AS (
      SELECT event_type, bucket_start, value,
             first_value(value) OVER (PARTITION BY event_type, bucket_start
                                      ORDER BY ts, event_id) AS open,
             first_value(value) OVER (PARTITION BY event_type, bucket_start
                                      ORDER BY ts DESC, event_id DESC) AS close
      FROM b
    )
    SELECT bucket_start, event_type, min(open) AS open, max(value) AS high,
           min(value) AS low, min(close) AS close, count(*) AS n_events
    FROM w GROUP BY event_type, bucket_start
    """,
    doc="OHLC time-series resample (1-min bars per event_type): one "
    "hash-agg shuffle; min_by/max_by on a (ts, event_id) struct pin "
    "open/close deterministically — no per-window sort. The oracle "
    "derives open/close via window first_value with the same tiebreak.",
)
def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.windows import ohlc_downsample

    events = load_table(spark, sf_dir, "events")
    return ohlc_downsample(
        events,
        ts_col="ts",
        value_col="value",
        key_cols=["event_type"],
        duration="1 minute",
        tiebreak="event_id",
    )


# ---------------------------------------------------------------------------
# Cumulative distinct users (running COUNT(DISTINCT) rewrite)
# ---------------------------------------------------------------------------


@register(
    "cumulative_distinct_users",
    oracle="""
    WITH f AS (
      SELECT user_id, min(date_trunc('day', ts)) AS d FROM events GROUP BY user_id
    ), c AS (
      SELECT d, count(*) AS new_users FROM f GROUP BY d
    ), days AS (
      SELECT DISTINCT date_trunc('day', ts) AS d FROM events
    )
    SELECT days.d AS day, coalesce(new_users, 0) AS new_users,
           CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY days.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM days LEFT JOIN c ON days.d = c.d
    """,
    doc="Running count-distinct rewrite: a naive cumulative "
    "COUNT(DISTINCT user) per day rescans every prefix (O(days x n)); "
    "instead min-day per user -> new-user counts per day -> running "
    "sum. Two key-partitioned aggs plus a window over |days| rows — "
    "the standard decomposition that makes expanding-distinct linear.",
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    first_day = events.groupBy("user_id").agg(F.min(day).alias("d"))
    new_users = first_day.groupBy("d").agg(F.count("*").alias("new_users"))
    days = events.select(day.alias("d")).distinct()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(new_users, "d", "left")
        .select(
            F.col("d").alias("day"),
            F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
        )
        .withColumn("cum_users", F.sum("new_users").over(w))
    )


# ---------------------------------------------------------------------------
# Funnel transitions (CEP-lite pattern matching)
# ---------------------------------------------------------------------------


@register(
    "funnel_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS pt, lag(ts) OVER w AS pts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
    )
    SELECT user_id, count(*) AS n_funnel
    FROM o
    WHERE pt = 'view' AND event_type = 'purchase'
      AND epoch_us(ts) - epoch_us(pts) <= 1800000000
    GROUP BY user_id
    """,
    doc="CEP-lite sequence detection: per user, count of immediate "
    "view->purchase transitions within 30 min, via lag over a "
    "(ts, event_id)-ordered keyed window — one exchange on user_id, "
    "then a key-local agg (no second wide shuffle: the groupBy key is "
    "the window partition key, so AQE reuses the partitioning).",
)
def q_funnel_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_type = F.lag("event_type").over(w)
    prev_ts = F.lag("ts").over(w)
    hit = (
        (prev_type == "view")
        & (F.col("event_type") == "purchase")
        & (F.col("ts") - prev_ts <= F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("hit", hit.cast("int"))
        .filter(F.col("hit") == 1)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_funnel"))
    )


# ---------------------------------------------------------------------------
# Skew-salted hot-key join (result-invariant: plain-join oracle)
# ---------------------------------------------------------------------------


@register(
    "salted_hot_key_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Manual skew-join salting (partitioning.salted_join_hot_keys): "
    "the dim side's hot keys explode into n_salts replicas, the fact "
    "side's hot rows salt randomly, the join runs on (key, salt) — so "
    "one pathological key spreads over n_salts reducers instead of "
    "stalling one. Salting is RESULT-invariant, hence the plain-join "
    "oracle; the streaming-join path needs this because AQE skew "
    "handling is batch-only.",
)
def q_salted_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.partitioning import salted_join_hot_keys

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    hot = [1, 2, 3]  # stand-ins for profiled hot keys
    joined = salted_join_hot_keys(orders, cust, key="custkey", hot_keys=hot, n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# ANN recall self-evaluation: LSH top-k vs exact top-k
# ---------------------------------------------------------------------------


def _ann_recall_oracle() -> str:
    from flink_anomaly_spark.plans.registry import QUERIES

    lsh = QUERIES["embedding_ann_lsh"].oracle
    exact = QUERIES["embedding_topk"].oracle
    return f"""
    WITH lsh AS ({lsh}), exact AS ({exact})
    SELECT exact.qid,
           round(sum(CASE WHEN lsh.nid IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS recall_at_5
    FROM exact LEFT JOIN lsh ON exact.qid = lsh.qid AND exact.nid = lsh.nid
    GROUP BY exact.qid
    """


@register(
    "ann_lsh_recall",
    oracle=None,  # installed below — composes the two registered oracles
    doc="Index-quality self-evaluation: recall@5 of the LSH ANN against "
    "the exact brute-force top-5, per query. Both the Spark side and "
    "the oracle COMPOSE the two registered queries, so this stays in "
    "lockstep with them by construction — the eval harness an ANN "
    "deployment runs before trading recall for speed.",
)
def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.plans.registry import QUERIES

    exact = QUERIES["embedding_topk"].build(spark, sf_dir).select("qid", "nid")
    lsh = (
        QUERIES["embedding_ann_lsh"].build(spark, sf_dir)
        .select("qid", "nid")
        .withColumn("__hit", F.lit(1))
    )
    return (
        exact.join(lsh, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))) * 1.0 / F.count("*"), 4
            ).alias("recall_at_5")
        )
    )


def _install_ann_recall_oracle() -> None:
    from flink_anomaly_spark.plans.registry import QUERIES, QuerySpec

    spec = QUERIES["ann_lsh_recall"]
    QUERIES["ann_lsh_recall"] = QuerySpec(
        name=spec.name, build=spec.build, oracle=_ann_recall_oracle(), doc=spec.doc
    )


_install_ann_recall_oracle()


def _ann_ivf_recall_oracle() -> str:
    from flink_anomaly_spark.plans.registry import QUERIES

    ivf = QUERIES["embedding_ann_ivf"].oracle
    exact = QUERIES["embedding_topk"].oracle
    return f"""
    WITH ivf AS ({ivf}), exact AS ({exact})
    SELECT exact.qid,
           round(sum(CASE WHEN ivf.nid IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS recall_at_5
    FROM exact LEFT JOIN ivf ON exact.qid = ivf.qid AND exact.nid = ivf.nid
    GROUP BY exact.qid
    """


@register(
    "ann_ivf_recall",
    oracle=None,  # installed below — composes the two registered oracles
    doc="recall@5 of the IVF-flat index against exact brute force, per "
    "query — the n_probe tuning signal (recall rises with probed "
    "cells). Same composed-oracle construction as ann_lsh_recall. The "
    "two arms score the SAME persisted (vec_id, embedding) projection "
    "— the evaluation reads the corpus parquet once, not once per arm "
    "(VERDICT r8 #2: the same index-frame sharing 767deec gave IVFPQ); "
    "the centroid collect doubles as the cache materialization.",
)
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.dedup import _persist
    from flink_anomaly_spark.operators.similarity import (
        brute_force_topk,
        collect_centroids,
        ivf_flat_topk,
    )

    emb = _persist(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    key = _ivf_cache_key(sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE.clear()
        _IVF_CENTROID_CACHE[key] = collect_centroids(
            emb, "vec_id", "embedding", _IVF_CENTROID_IDS
        )
    # both arms must mirror the standalone registrations exactly:
    # embedding_topk = brute_force_topk(query_ids=range(10), k=5);
    # embedding_ann_ivf = ivf_flat_topk(8 sampled centroids, n_probe=2)
    exact = brute_force_topk(
        emb, id_col="vec_id", vec_col="embedding", query_ids=list(range(10)), k=5
    ).select("qid", "nid")
    ivf = (
        ivf_flat_topk(
            emb, id_col="vec_id", vec_col="embedding", query_ids=list(range(10)),
            k=5, centroid_ids=_IVF_CENTROID_IDS,
            centroids=_IVF_CENTROID_CACHE[key],
        )
        .select("qid", "nid")
        .withColumn("__hit", F.lit(1))
    )
    return (
        exact.join(ivf, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))) * 1.0 / F.count("*"), 4
            ).alias("recall_at_5")
        )
    )


_MMR_QUERIES = 6
_MMR_POOL = 12
_MMR_K = 4


def _mmr_oracle(n_queries: int = _MMR_QUERIES, pool_n: int = _MMR_POOL, k: int = _MMR_K) -> str:
    """Unrolled-SQL oracle for MMR diversified top-k: the fixed k
    greedy rounds as k CTE blocks (argmax with the id tiebreak, the
    running selected set as UNION ALL), sharing the λ=0.7 / μ=0.3
    DOUBLE literals and the round(cos, 6) similarity with the engine."""
    cos_q = (
        f"{_pair_dot('qvec', 'nvec')} / "
        f"(sqrt({_pair_dot('qvec', 'qvec')}) * sqrt({_pair_dot('nvec', 'nvec')}))"
    )
    cos_p = (
        f"{_pair_dot('e1.embedding', 'e2.embedding')} / "
        f"(sqrt({_pair_dot('e1.embedding', 'e1.embedding')}) * "
        f"sqrt({_pair_dot('e2.embedding', 'e2.embedding')}))"
    )
    s1_score = "CAST(0.7 AS DOUBLE) * simq - CAST(0.3 AS DOUBLE) * CAST(0.0 AS DOUBLE)"
    parts = [f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
               WHERE vec_id < {n_queries}),
    c AS (SELECT vec_id AS nid, embedding AS nvec FROM embeddings),
    scored AS (SELECT qid, nid, round({cos_q}, 6) AS simq
               FROM c JOIN q ON nid != qid),
    pool AS (SELECT qid, nid, simq FROM (
      SELECT qid, nid, simq,
             row_number() OVER (PARTITION BY qid ORDER BY simq DESC, nid ASC) AS rk
      FROM scored) t WHERE rk <= {pool_n}),
    pp AS (SELECT a.qid, a.nid AS n1, b.nid AS n2, round({cos_p}, 6) AS sim
           FROM pool a JOIN pool b ON a.qid = b.qid AND a.nid != b.nid
           JOIN embeddings e1 ON e1.vec_id = a.nid
           JOIN embeddings e2 ON e2.vec_id = b.nid),
    s1 AS (SELECT qid, nid, score AS mmr_score, CAST(1 AS BIGINT) AS pick_rank FROM (
      SELECT qid, nid, {s1_score} AS score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY {s1_score} DESC, nid ASC) AS rk
      FROM pool) t WHERE rk = 1),
    sel1 AS (SELECT qid, nid FROM s1)"""]
    for t in range(2, k + 1):
        score = (
            "CAST(0.7 AS DOUBLE) * p.simq - CAST(0.3 AS DOUBLE) * "
            f"coalesce(pen{t}.pen, CAST(0.0 AS DOUBLE))"
        )
        parts.append(f""",
    pen{t} AS (SELECT pp.qid, pp.n1 AS nid, max(pp.sim) AS pen
               FROM pp JOIN sel{t - 1} s ON s.qid = pp.qid AND s.nid = pp.n2
               GROUP BY pp.qid, pp.n1),
    s{t} AS (SELECT qid, nid, score AS mmr_score, CAST({t} AS BIGINT) AS pick_rank FROM (
      SELECT p.qid AS qid, p.nid AS nid, {score} AS score,
             row_number() OVER (PARTITION BY p.qid
                                ORDER BY {score} DESC, p.nid ASC) AS rk
      FROM pool p
      LEFT JOIN pen{t} ON pen{t}.qid = p.qid AND pen{t}.nid = p.nid
      WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} z
                        WHERE z.qid = p.qid AND z.nid = p.nid)
      ) t WHERE rk = 1),
    sel{t} AS (SELECT qid, nid FROM sel{t - 1}
               UNION ALL SELECT qid, nid FROM s{t})""")
    union = " UNION ALL ".join(
        f"SELECT qid, nid, pick_rank, mmr_score FROM s{t}" for t in range(1, k + 1)
    )
    return "".join(parts) + "\n    " + union


@register(
    "mmr_diversified_topk",
    oracle=_mmr_oracle(),
    doc="Maximal Marginal Relevance diversified retrieval (Carbonell-"
    "Goldstein SIGIR'98) — the post-ANN diversification stage of a RAG "
    "pipeline: from each query's 12-candidate cosine pool, 4 greedy "
    "picks by lambda*sim(q,d) - mu*max_selected sim(d,s) with "
    "lambda=0.7, mu=0.3 (mu an explicit literal, never 1-lambda: the "
    "two doubles differ). Pool and its pairwise-sim table are "
    "persisted (|queries|*12 rows); each round is a window argmax over "
    "them — no corpus re-scan; the k-round chain is inherent to MMR's "
    "greedy definition. The oracle unrolls the same 4 rounds with "
    "identical literals, tiebreaks, and the empty-max-is-zero first "
    "pick.",
)
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import mmr_diversified_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_diversified_topk(
        emb, id_col="vec_id", vec_col="embedding",
        query_ids=list(range(_MMR_QUERIES)), pool_n=_MMR_POOL, k=_MMR_K,
    )


def _install_ann_ivf_recall_oracle() -> None:
    from flink_anomaly_spark.plans.registry import QUERIES, QuerySpec

    spec = QUERIES["ann_ivf_recall"]
    QUERIES["ann_ivf_recall"] = QuerySpec(
        name=spec.name, build=spec.build, oracle=_ann_ivf_recall_oracle(), doc=spec.doc
    )


_install_ann_ivf_recall_oracle()


# ---------------------------------------------------------------------------
# RANGE-frame window: trailing 1 h moving average per user
# ---------------------------------------------------------------------------


@register(
    "time_range_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER w AS n_window,
           round(avg(value) OVER w, 4) AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Event-time RANGE window frame (trailing 1 h per user) — the "
    "value-based frame ROWS can't express: the frame holds every event "
    "within 3600 s, however many there are. Both engines order by exact "
    "epoch microseconds with an integer frame bound, so window "
    "membership is bit-identical; one exchange on user_id.",
)
def q_time_range_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_window"),
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
    )


@register(
    "event_sessionization",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(new_s) OVER p AS BIGINT) AS session_id,
           max(CASE WHEN new_s = 1 THEN ts END) OVER p AS session_start
    FROM o
    WINDOW p AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
                 ROWS UNBOUNDED PRECEDING)
    """,
    doc="Per-event session assignment (gaps-and-islands, 30 min gap): "
    "the row-level companion to session_window_agg — every event gets "
    "its session ordinal and session start timestamp. Both the "
    "boundary flag and the running session id/start come from ONE "
    "user_id exchange (the session start is the prefix-max of "
    "boundary timestamps, avoiding a second (user, session) shuffle); "
    "ties broken by event_id so the assignment is deterministic.",
)
def q_event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) >= F.expr("INTERVAL 30 MINUTES"))
    )
    flagged = events.select(
        "event_id", "user_id", "ts", gap_ok.cast("int").alias("new_s")
    )
    p = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("new_s").over(p).alias("session_id"),
        F.max(F.when(F.col("new_s") == 1, F.col("ts"))).over(p).alias("session_start"),
    )


@register(
    "map_functions",
    oracle="""
    SELECT event_id,
           len(json_keys(props)) AS n_keys,
           CAST(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END
                AS INT) AS has_k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
    doc="MapType surface: parse the JSON props into map<string,bigint> "
    "(from_json), then map_keys / map_contains_key / element_at — all "
    "JVM-side Catalyst map expressions, narrow scan, no shuffle.",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return events.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.map_contains_key(m, "k").cast("int").alias("has_k"),
        F.element_at(m, "k").alias("k_value"),
    )


def _centroid_outlier_oracle(n_cells: int = 8, stride: int = 7, k: int = 20) -> str:
    cos = (
        f"{_pair_dot('v.embedding', 'c.cvec')} / "
        f"(sqrt({_pair_dot('v.embedding', 'v.embedding')}) * "
        f"sqrt({_pair_dot('c.cvec', 'c.cvec')}))"
    )
    return f"""
    WITH cent AS (
      SELECT c.cell, e.embedding AS cvec
      FROM embeddings e JOIN (SELECT unnest(range(0, {n_cells})) AS cell) c
        ON e.vec_id = c.cell * {stride}
    ),
    best AS (
      SELECT vec_id, cell AS nearest_cell, round(1.0 - cos, 6) AS nearest_dist
      FROM (
        SELECT v.vec_id, c.cell, {cos} AS cos,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cos} DESC, c.cell ASC) AS rn
        FROM embeddings v CROSS JOIN cent c) t
      WHERE rn = 1
    )
    SELECT vec_id, nearest_cell, nearest_dist
    FROM best ORDER BY nearest_dist DESC, vec_id ASC LIMIT {k}
    """


def _lloyd_oracle(
    n_cells: int = 8, stride: int = 7, n_iter: int = 2, top_n: int = 20
) -> str:
    """DuckDB SQL unrolling the SAME fixed-iteration spherical Lloyd
    steps as anomaly.kmeans_lloyd_outliers: sampled init, cosine
    assignment with the bit-identical list_reduce dot fold, fixed-point
    micro-unit centroid means (integer sums are order-independent, so
    the cross-engine float-association problem that makes generic
    KMeans un-oracle-able disappears), empty cells dropped by the
    group-by on both sides."""

    def cos(v: str, c: str) -> str:
        return (
            f"{_pair_dot(v, c)} / "
            f"(sqrt({_pair_dot(v, v)}) * sqrt({_pair_dot(c, c)}))"
        )

    ctes = [
        f"""cent0 AS (
      SELECT c.cell, e.embedding AS cvec
      FROM embeddings e JOIN (SELECT unnest(range(0, {n_cells})) AS cell) c
        ON e.vec_id = c.cell * {stride}
    )"""
    ]
    for i in range(1, n_iter + 1):
        prev, cur = f"cent{i - 1}", f"cent{i}"
        c = cos("v.embedding", "c.cvec")
        ctes.append(
            f"""a{i} AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT v.vec_id, v.embedding, c.cell,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {c} DESC, c.cell ASC) AS rn
        FROM embeddings v CROSS JOIN {prev} c) t
      WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""{cur} AS (
      SELECT cell, list(c ORDER BY pos) AS cvec FROM (
        SELECT cell, pos,
               round(sum(ival) / (count(*) * 1000000.0), 6) AS c
        FROM (
          SELECT a.cell, i.pos,
                 CAST(round(CAST(a.embedding[i.pos + 1] AS DOUBLE)
                            * 1000000.0) AS BIGINT) AS ival
          FROM a{i} a CROSS JOIN
               (SELECT unnest(range(0, {_DIM})) AS pos) i) p
        GROUP BY cell, pos) g
      GROUP BY cell
    )"""
        )
    cf = cos("v.embedding", "c.cvec")
    final = f"""best AS (
      SELECT vec_id, cell AS cluster,
             round(1.0 - cos, 6) + 0.0 AS centroid_dist
      FROM (
        SELECT v.vec_id, c.cell, {cf} AS cos,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {cf} DESC, c.cell ASC) AS rn
        FROM embeddings v CROSS JOIN cent{n_iter} c) t
      WHERE rn = 1
    )"""
    ctes.append(final)
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT vec_id, cluster, centroid_dist
    FROM best ORDER BY centroid_dist DESC, vec_id ASC LIMIT {top_n}
    """
    )


@register(
    "kmeans_lloyd_outliers",
    oracle=_lloyd_oracle(),
    doc="Fixed-iteration spherical Lloyd KMeans outliers (VERDICT r4 "
    "#2): 2 unrolled assign/update steps from the deterministic IVF "
    "init set, centroid means accumulated in integer micro-units so "
    "the update is order-independent and the DuckDB oracle unrolls "
    "identical steps — the hash-checkable replacement for the "
    "permanently-rows-only MLlib kmeans_embedding_outliers. Assignment "
    "is a narrow literal-inlined map (no shuffle); each update is one "
    "k*dim-group partial agg + a 512-value model collect.",
)
def q_kmeans_lloyd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.anomaly import kmeans_lloyd_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd_outliers(
        emb, "vec_id", "embedding", _IVF_CENTROID_IDS, n_iter=2, top_n=20
    )


@register(
    "centroid_distance_outliers",
    oracle=_centroid_outlier_oracle(),
    doc="Distance-to-nearest-centroid outliers over the SAME fixed "
    "deterministic centroid set the IVF index uses — the oracle-able "
    "companion to the rows-only MLlib kmeans_embedding_outliers "
    "(Lloyd iterations aren't portable across engines; fixed sampled "
    "centroids are). Narrow no-shuffle cell scoring against 8 inlined "
    "literals, then TakeOrdered top-20 by cosine distance.",
)
def q_centroid_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import top_k
    from flink_anomaly_spark.operators.similarity import _cell_scores, collect_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    key = _ivf_cache_key(sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE.clear()
        _IVF_CENTROID_CACHE[key] = collect_centroids(
            emb, "vec_id", "embedding", _IVF_CENTROID_IDS
        )
    best = F.array_max(_cell_scores(F.col("embedding"), _IVF_CENTROID_CACHE[key]))
    scored = emb.select(
        "vec_id",
        best["cell"].alias("nearest_cell"),
        (F.round(F.lit(1.0) - best["cos"], 6) + F.lit(0.0)).alias("nearest_dist"),
    )
    return top_k(
        scored, order_by=[F.col("nearest_dist").desc(), F.col("vec_id").asc()], k=20
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix (signup week × activity-week offset)
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT f.user_id) AS n_active_users
    FROM first f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention: users bucketed by first-seen week, counted "
    "in each later activity week — the classic retention triangle. "
    "Both inputs hash-partition on user_id (the min-ts agg and the "
    "distinct reuse ONE exchange layout, and the join is co-located on "
    "it — no third shuffle); the final matrix agg carries "
    "|cohorts| x |offsets| groups. Week truncation is Monday-based on "
    "both engines; the offset is integer day-diff // 7, exact.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        first.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Table column profile (ANALYZE-style data-quality pass)
# ---------------------------------------------------------------------------


@register(
    "table_column_profile",
    oracle="""
    SELECT 'doc_id' AS column_name, count(*) AS n_rows,
           count(*) - count(doc_id) AS n_nulls,
           count(DISTINCT doc_id) AS n_distinct,
           min(CAST(doc_id AS VARCHAR)) AS min_str,
           max(CAST(doc_id AS VARCHAR)) AS max_str
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
           min(CAST(lang AS VARCHAR)), max(CAST(lang AS VARCHAR)) FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
           min(CAST(source AS VARCHAR)), max(CAST(source AS VARCHAR)) FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
           min(CAST(n_chars AS VARCHAR)), max(CAST(n_chars AS VARCHAR)) FROM documents
    """,
    doc="ANALYZE-style column profile of the documents table: row/null/"
    "distinct counts and lexicographic min/max per column (values "
    "cast to string so one schema covers every column type — the "
    "data-quality pass a pipeline runs before trusting a new corpus "
    "drop). ONE scan: unpivot to (column_name, value) then a single "
    "grouped agg — 4 groups whose partial aggs combine map-side; no "
    "per-column rescans. At 100 TB swap count(DISTINCT) for "
    "approx_count_distinct per column if exactness isn't required "
    "(the approx_stats query shows that form).",
)
def q_table_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    unpivoted = docs.select(
        F.expr(
            "stack(4, "
            "'doc_id', CAST(doc_id AS STRING), "
            "'lang', CAST(lang AS STRING), "
            "'source', CAST(source AS STRING), "
            "'n_chars', CAST(n_chars AS STRING)"
            ") AS (column_name, value)"
        )
    )
    return unpivoted.groupBy("column_name").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("value")).alias("n_nulls"),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_str"),
        F.max("value").alias("max_str"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quartiles)
# ---------------------------------------------------------------------------


@register(
    "rfm_customer_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, frequency, monetary,
             ntile(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS r_quartile,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_quartile,
             ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_quartile
      FROM per_cust
    )
    SELECT r_quartile, f_quartile, m_quartile,
           count(*) AS n_customers,
           round(sum(monetary), 2) AS segment_value
    FROM scored GROUP BY 1, 2, 3
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary "
    "rollup, quartile-scored by ntile over UNIQUE orderings (metric "
    "desc, custkey asc — deterministic on both engines; ntile with "
    "tied, non-unique orderings is partition-order-dependent and would "
    "not oracle), aggregated into the 4x4x4 segment matrix. One "
    "custkey agg exchange; the three ntiles share one single-partition "
    "sort over |customers| pre-aggregated rows — at 100 TB swap ntile "
    "for percentile-threshold joins (approx_percentile bounds broadcast "
    "back) to avoid the global sort; the segment matrix agg is 64 "
    "groups regardless of scale.",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = per_cust.select(
        "o_custkey",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), F.col("o_custkey").asc()))
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc()))
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("o_custkey").asc()))
        .alias("m_quartile"),
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("segment_value"),
    )


def _kmv_oracle(col: str = "user_id", table: str = "events", k: int = 256) -> str:
    h = f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)),1,8)) AS BIGINT)"
    est = (
        f"CASE WHEN k_used < {k} THEN CAST(exact_distinct AS DOUBLE) "
        f"ELSE {float(k - 1)} * 4294967296.0 / kth_hash END"
    )
    return f"""
    WITH h AS (SELECT DISTINCT {h} AS h FROM {table} WHERE {col} IS NOT NULL),
    b AS (SELECT h FROM h ORDER BY h LIMIT {k}),
    a AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth_hash FROM b),
    e AS (SELECT CAST(count(DISTINCT {col}) AS BIGINT) AS exact_distinct
          FROM {table})
    SELECT k_used, kth_hash, round({est}, 4) AS est_distinct, exact_distinct,
           round(({est} - exact_distinct) / exact_distinct * 100, 4) + 0.0
             AS rel_err_pct
    FROM a CROSS JOIN e
    """


@register(
    "kmv_distinct_users",
    oracle=_kmv_oracle(),
    doc="KMV bottom-k distinct sketch over events.user_id — the "
    "deterministic, ORACLE-EXACT approximate-distinct counter "
    "(Bar-Yossef et al. 2002; basis of the theta sketch). HLL's "
    "register layout is engine-private (approx_stats stays rows-only "
    "for that reason); KMV over md5 reproduces exactly in SQL, so the "
    "sketch's estimate AND its self-reported error are hash-checked. "
    "Narrow hash map, partial-agg distinct, TakeOrdered bottom-k — no "
    "wide shuffle at any scale.",
)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import kmv_distinct_estimate

    return kmv_distinct_estimate(load_table(spark, sf_dir, "events"), "user_id", k=256)


def _kmv_overlap_oracle(k: int = 256) -> str:
    def h(x: str) -> str:
        return f"CAST(('0x' || substr(md5(CAST({x} AS VARCHAR)),1,8)) AS BIGINT)"

    est_u = (
        f"CASE WHEN k_used < {k} THEN CAST(exact_union AS DOUBLE) "
        f"ELSE {float(k - 1)} * 4294967296.0 / kth END"
    )
    return f"""
    WITH ha AS (SELECT DISTINCT {h("c_custkey")} AS h FROM customer
                WHERE c_custkey IS NOT NULL),
    hb AS (SELECT DISTINCT {h("o_custkey")} AS h FROM orders
           WHERE o_custkey IS NOT NULL),
    bka AS (SELECT h, 1 AS in_a FROM ha ORDER BY h LIMIT {k}),
    bkb AS (SELECT h, 1 AS in_b FROM hb ORDER BY h LIMIT {k}),
    m AS (
      SELECT h, coalesce(in_a, 0) AS in_a, coalesce(in_b, 0) AS in_b
      FROM bka FULL JOIN bkb USING (h)
      ORDER BY h LIMIT {k}
    ),
    st AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth,
                  CAST(sum(in_a * in_b) AS BIGINT) AS n_both FROM m),
    ea AS (SELECT DISTINCT c_custkey AS v FROM customer
           WHERE c_custkey IS NOT NULL),
    eb AS (SELECT DISTINCT o_custkey AS v FROM orders
           WHERE o_custkey IS NOT NULL),
    eu AS (SELECT CAST(count(*) AS BIGINT) AS exact_union
           FROM (SELECT v FROM ea FULL JOIN eb USING (v)) t),
    ei AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersection
           FROM ea JOIN eb USING (v))
    SELECT k_used,
           round({est_u}, 4) AS est_union,
           round(n_both / k_used * ({est_u}), 4) AS est_intersection,
           round(n_both / k_used, 4) AS est_jaccard,
           exact_union, exact_intersection
    FROM st CROSS JOIN eu CROSS JOIN ei
    """


@register(
    "kmv_custkey_overlap",
    oracle=_kmv_overlap_oracle(),
    doc="KMV/theta-sketch SET ALGEBRA over two key columns (customers "
    "vs ordering customers): bottom-k union sketch -> union estimate, "
    "Jaccard from the sketch overlap, intersection by inclusion-"
    "exclusion (Beyer et al. 2007). Deterministic md5 arithmetic makes "
    "the normally engine-private sketch ORACLE-EXACT, and the exact "
    "counts ride along so the estimate self-reports its error. Each "
    "100 TB side reduces to k hashes via TakeOrdered before any join.",
)
def q_kmv_custkey_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import kmv_set_overlap

    return kmv_set_overlap(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        k=256,
    )


# ---------------------------------------------------------------------------
# Register-based sketches: HyperLogLog + count-min (operators/sketches.py)
# ---------------------------------------------------------------------------

from flink_anomaly_spark.operators.sketches import (  # noqa: E402
    countmin_oracle_sql,
    countmin_term_estimates,
    hll_distinct_estimate,
    hll_oracle_sql,
)
from flink_anomaly_spark.plans.fragments import TOKS as _TOKS_FRAG  # noqa: E402


@register(
    "hll_distinct_users",
    oracle=hll_oracle_sql("user_id", "events", p=8),
    doc="HyperLogLog (Flajolet et al. 2007) distinct-user estimate "
    "with 256 registers, built RELATIONALLY from the md5 hash so the "
    "normally engine-private register layout is oracle-exact: bucket "
    "groupBy-max (map-side partials, <=m rows shuffled per task), "
    "EXACT scaled-integer harmonic sum (order-independent, unlike a "
    "double sum of 2^-M), LinearCounting small-range branch per the "
    "paper. Completes the KMV/theta sketch family with the register "
    "sketch that real pipelines merge across 100 TB partitions.",
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_distinct_estimate(load_table(spark, sf_dir, "events"), "user_id", p=8)


@register(
    "countmin_top_terms",
    oracle=countmin_oracle_sql(_TOKS_FRAG, d=3, w=16, top_n=15),
    doc="Count-min sketch (Cormode & Muthukrishnan 2005) frequency "
    "estimates vs exact for the top-15 corpus terms: token stream "
    "collapses map-side to vocabulary counts (the only data-sized "
    "shuffle), the 3x16 cell table is built from the vocab by a "
    "weighted (row,bucket) aggregate, point queries take min over the "
    "3 salted-md5 rows against the BROADCAST cell table. The sketch is "
    "deliberately undersized (3x16 cells vs 31 terms) so overcount "
    ">= 0 actually exercises and self-reports the collision error.",
)
def q_countmin_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return countmin_term_estimates(
        load_table(spark, sf_dir, "documents"), d=3, w=16, top_n=15
    )


@register(
    "hot_key_skew_report",
    oracle="""
    WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total_rows FROM events),
    k AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS key_rows
          FROM events GROUP BY event_type),
    top AS (SELECT key, key_rows FROM k
            ORDER BY key_rows DESC, key ASC LIMIT 10)
    SELECT key, key_rows, total_rows,
           round(key_rows * 100.0 / total_rows, 4) AS share_pct,
           round(CAST(key_rows AS DOUBLE) * 32 / total_rows, 4) AS skew_ratio,
           CAST(CASE WHEN CAST(key_rows AS DOUBLE) * 32 / total_rows > 1
                     THEN ceil(CAST(key_rows AS DOUBLE) * 32 / total_rows)
                     ELSE 1 END AS BIGINT) AS suggested_salt
    FROM top CROSS JOIN t
    """,
    doc="Shuffle-skew diagnostic over events.event_type: top keys with "
    "table share, skew ratio vs an average of 32 reducers, and the "
    "ceil(ratio) salt factor that spreads the key back to average — "
    "the pre-flight check behind the salted-join/AQE-skew plans. "
    "Map-side-partial key counts, TakeOrdered, 1-row broadcast total.",
)
def q_hot_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import hot_key_skew_report

    return hot_key_skew_report(
        load_table(spark, sf_dir, "events"), key_col="event_type",
        n_partitions=32, top_n=10,
    )


@register(
    "gap_fill_forward_daily",
    oracle="""
    WITH hourly AS (
      SELECT user_id AS key, hour, value AS v FROM (
        SELECT user_id, date_trunc('hour', ts) AS hour, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1),
    rng AS (SELECT key, min(hour) AS h0, max(hour) AS h1
            FROM hourly GROUP BY key),
    grid AS (SELECT key, unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                      AS hour
             FROM rng),
    j AS (SELECT g.key, g.hour, h.v
          FROM grid g LEFT JOIN hourly h ON g.key = h.key AND g.hour = h.hour),
    f AS (SELECT key, hour,
                 last_value(v IGNORE NULLS)
                   OVER (PARTITION BY key ORDER BY hour
                         ROWS UNBOUNDED PRECEDING) AS fv,
                 v IS NULL AS fl
          FROM j)
    SELECT key AS user_id, date_trunc('day', hour) AS day,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(CASE WHEN fl THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           round(avg(fv), 6) AS avg_value
    FROM f GROUP BY 1, 2
    """,
    doc="Gap filling with forward fill (TimescaleDB "
    "time_bucket_gapfill/locf; the GENERATE_SERIES + LAST_VALUE IGNORE "
    "NULLS warehouse idiom): hourly last-event buckets per user, dense "
    "per-user hour grid over the user's OWN range (sequence explode — "
    "never a global calendar cross join), last-observation-carried-"
    "forward window, per-day coverage rollup (n_filled/n_hours). "
    "Hourly argmax + range share one key exchange; grid is bounded by "
    "time span, not data volume.",
)
def q_gap_fill_forward_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import gap_fill_forward_daily

    return gap_fill_forward_daily(
        load_table(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        val_col="value",
        tiebreak_col="event_id",
    )


def _kmv_difference_oracle(k: int = 256) -> str:
    def h(x: str) -> str:
        return f"CAST(('0x' || substr(md5(CAST({x} AS VARCHAR)),1,8)) AS BIGINT)"

    est_u = (
        f"CASE WHEN k_used < {k} THEN CAST(exact_union AS DOUBLE) "
        f"ELSE {float(k - 1)} * 4294967296.0 / kth END"
    )
    est_a = (
        f"CASE WHEN ka_used < {k} THEN CAST(exact_a AS DOUBLE) "
        f"ELSE {float(k - 1)} * 4294967296.0 / kth_a END"
    )
    return f"""
    WITH ha AS (SELECT DISTINCT {h("c_custkey")} AS h FROM customer
                WHERE c_custkey IS NOT NULL),
    hb AS (SELECT DISTINCT {h("o_custkey")} AS h FROM orders
           WHERE o_custkey IS NOT NULL),
    bka AS (SELECT h, 1 AS in_a FROM ha ORDER BY h LIMIT {k}),
    bkb AS (SELECT h, 1 AS in_b FROM hb ORDER BY h LIMIT {k}),
    m AS (
      SELECT h, coalesce(in_a, 0) AS in_a, coalesce(in_b, 0) AS in_b
      FROM bka FULL JOIN bkb USING (h)
      ORDER BY h LIMIT {k}
    ),
    st AS (SELECT CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth,
                  CAST(sum(in_a * in_b) AS BIGINT) AS n_both FROM m),
    sta AS (SELECT CAST(count(*) AS BIGINT) AS ka_used, max(h) AS kth_a
            FROM bka),
    ea AS (SELECT DISTINCT c_custkey AS v FROM customer
           WHERE c_custkey IS NOT NULL),
    eb AS (SELECT DISTINCT o_custkey AS v FROM orders
           WHERE o_custkey IS NOT NULL),
    e1 AS (SELECT CAST(count(*) AS BIGINT) AS exact_a FROM ea),
    ed AS (SELECT CAST(count(*) AS BIGINT) AS exact_difference
           FROM ea WHERE v NOT IN (SELECT v FROM eb)),
    eu AS (SELECT CAST(count(*) AS BIGINT) AS exact_union
           FROM (SELECT v FROM ea FULL JOIN eb USING (v)) t)
    SELECT k_used,
           round({est_a}, 4) AS est_a,
           round(n_both / k_used * ({est_u}), 4) AS est_intersection,
           round(({est_a}) - n_both / k_used * ({est_u}), 4)
             AS est_difference,
           exact_a, exact_difference
    FROM st CROSS JOIN sta CROSS JOIN e1 CROSS JOIN ed CROSS JOIN eu
    """


@register(
    "kmv_custkey_difference",
    oracle=_kmv_difference_oracle(),
    doc="KMV/theta-sketch set DIFFERENCE |customers \\ ordering "
    "customers| (the DataSketches AnotB operation, completing the "
    "union/intersection/Jaccard family of kmv_custkey_overlap): "
    "est|A\\B| = est|A| - overlap-fraction x est-union, all from the "
    "same deterministic md5 bottom-k sketches so the estimate AND its "
    "self-reported error are oracle-exact. Each 100 TB side reduces "
    "to k hashes via TakeOrdered before any set algebra.",
)
def q_kmv_custkey_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.relational import kmv_set_difference

    return kmv_set_difference(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        k=256,
    )


from flink_anomaly_spark.operators.sketches import (  # noqa: E402
    histogram_quantile_oracle_sql,
    histogram_quantile_sketch,
)


@register(
    "value_histogram_quantiles",
    oracle=histogram_quantile_oracle_sql(
        "value", "events", lo=0.0, hi=512.0, n_bins=64
    ),
    doc="Mergeable equi-width histogram quantile sketch over "
    "events.value — the rank/quantile member of the register-sketch "
    "family (HLL: cardinality, CMS: frequency): ONE groupBy onto 64 "
    "bins (map-side partials, <= 64 rows per map task, histograms "
    "merge by adding counts), then p50/p90/p99 by linear "
    "interpolation inside the first bin reaching q*N. Every step is "
    "IEEE add/mul/div on exactly representable operands (width 8.0), "
    "so estimates hash-match UNROUNDED cross-engine. Accuracy "
    "contract: +-width inside [lo, hi), edge-biased outside — the "
    "constant-state trade vs exact_percentiles' global sort.",
)
def q_value_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return histogram_quantile_sketch(
        load_table(spark, sf_dir, "events"), "value", lo=0.0, hi=512.0, n_bins=64
    )
