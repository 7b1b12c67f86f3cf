"""Embedding-column profiling & compression queries: per-dimension
statistics and int8 scalar quantization with reconstruction error —
the profile→compress pass a vector corpus goes through before ANN
indexing at 100 TB (4× memory cut, the FAISS ``SQ8`` scheme).

Oracles mirror the Spark arithmetic exactly: min/max are
order-insensitive (exact floats), means/stddevs are rounded, and the
error folds are SEQUENTIAL left folds on both engines
(``F.aggregate`` ↔ ``list_reduce``) so the doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_anomaly_spark.operators.similarity import (
    collect_dim_minmax,
    embedding_dim_stats,
    int8_quantize,
)
from flink_anomaly_spark.plans.registry import register
from flink_anomaly_spark.tables import load_table

_UNNESTED = (
    "(SELECT unnest(embedding) AS v, unnest(range(len(embedding))) AS dim "
    "FROM embeddings)"
)


@register(
    "embedding_dim_stats",
    oracle=f"""
    SELECT dim, count(*) AS n,
           round(avg(CAST(v AS DOUBLE)), 6) AS mean,
           round(stddev_samp(CAST(v AS DOUBLE)), 6) AS std,
           CAST(min(v) AS DOUBLE) AS mn,
           CAST(max(v) AS DOUBLE) AS mx
    FROM {_UNNESTED}
    GROUP BY dim ORDER BY dim
    """,
    doc="Per-dimension embedding profile (count/mean/std/min/max): "
    "narrow posexplode + partial-agg on the dim key — the exchange "
    "carries ~dim rows per map task whatever the corpus size.",
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb, vec_col="embedding")


def _quantize_oracle() -> str:
    # per-element expressions, shared so q / deq / err can't drift apart
    q = ("CAST(round((CAST(embedding[i+1] AS DOUBLE) - mins[i+1])"
         " / (maxs[i+1] - mins[i+1]) * 254) - 127 AS BIGINT)")
    q_guard = f"CASE WHEN maxs[i+1] = mins[i+1] THEN CAST(0 AS BIGINT) ELSE {q} END"
    deq = (f"mins[i+1] + CAST({q_guard} + 127 AS DOUBLE) / 254"
           " * (maxs[i+1] - mins[i+1])")
    err = f"(CAST(embedding[i+1] AS DOUBLE) - ({deq})) * (CAST(embedding[i+1] AS DOUBLE) - ({deq}))"
    absd = f"abs(CAST(embedding[i+1] AS DOUBLE) - ({deq}))"
    return f"""
    WITH mm AS (
      SELECT dim, CAST(min(v) AS DOUBLE) AS mn, CAST(max(v) AS DOUBLE) AS mx
      FROM {_UNNESTED} GROUP BY dim
    ), arrs AS (
      SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs FROM mm
    )
    SELECT vec_id, len(embedding) AS n_dims,
           array_to_string(list_transform(range(len(embedding)), i -> {q_guard}), ',') AS q_csv,
           round(list_reduce(list_prepend(0.0,
                   list_transform(range(len(embedding)), i -> {err})),
                 (a, b) -> a + b) / len(embedding), 9) AS mse,
           round(list_max(list_transform(range(len(embedding)), i -> {absd})), 9)
             AS max_abs_err
    FROM embeddings, arrs
    """


#: quantizer 'index build' cache — per-dim (min, max), keyed by
#: (path, mtime, size) of embeddings.parquet exactly like the IVF
#: centroid cache, so a testdata regeneration invalidates it.
_MINMAX_CACHE: dict[tuple[str, int, int], tuple[list[float], list[float]]] = {}


@register(
    "embedding_int8_quantize",
    oracle=_quantize_oracle(),
    doc="Int8 scalar quantization (FAISS SQ8): per-dim min/max collected "
    "once (dim-sized, the IVF-centroid pattern) and inlined as literals "
    "→ narrow zero-shuffle encode + sequential-fold reconstruction "
    "error, bit-identical to the oracle's list_reduce.",
)
def q_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.plans.relational_ext import _ivf_cache_key

    emb = load_table(spark, sf_dir, "embeddings")
    key = _ivf_cache_key(sf_dir)
    if key not in _MINMAX_CACHE:
        _MINMAX_CACHE.clear()
        _MINMAX_CACHE[key] = collect_dim_minmax(emb, "embedding")
    mins, maxs = _MINMAX_CACHE[key]
    return int8_quantize(emb, id_col="vec_id", vec_col="embedding", mins=mins, maxs=maxs)


@register(
    "embedding_covariance",
    oracle="""
    WITH idx AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS d),
    pairs AS (SELECT a.d AS i, b.d AS j FROM idx a JOIN idx b ON a.d <= b.d)
    SELECT p.i, p.j,
           round((sum(CAST(e.embedding[p.i] AS DOUBLE) * CAST(e.embedding[p.j] AS DOUBLE))
                  - sum(CAST(e.embedding[p.i] AS DOUBLE))
                    * sum(CAST(e.embedding[p.j] AS DOUBLE)) / count(*))
                 / (count(*) - 1), 6) + 0.0 AS cov
    FROM pairs p, embeddings e
    GROUP BY p.i, p.j
    """,
    doc="Distributed sample covariance of the 64-dim embedding corpus — "
    "the PCA/whitening building block. One Arrow-batched mapInPandas "
    "pass does a single BLAS M.T@M per batch (no per-row d-squared "
    "explode); the exchange carries O(batches x d^2) partial rows "
    "regardless of corpus size; the mean correction joins the 64-row "
    "diagonal sums back as broadcasts.",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import embedding_covariance

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, vec_col="embedding", dim=64)


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection 64d → 16d (sign matrix)
# ---------------------------------------------------------------------------

_RP_IN, _RP_OUT = 64, 16


def _rp_sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5('rp:i:j') — computed ONCE at plan-build
    time in Python and inlined as literals into BOTH the Spark plan and
    the oracle SQL, so the 'random' matrix cannot drift between engines."""
    import hashlib

    return 1 if hashlib.md5(f"rp:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1


_RP_SIGNS = [[_rp_sign(i, j) for i in range(_RP_IN)] for j in range(_RP_OUT)]


def _rp_oracle() -> str:
    cols = []
    for j in range(_RP_OUT):
        # sign vector inlined as a list literal; the fold is a SEQUENTIAL
        # list_reduce seeded with 0.0 — mirrored exactly by the Spark
        # side's F.aggregate left fold, so the doubles are bit-identical
        signs = "[" + ",".join(f"{s}.0" for s in _RP_SIGNS[j]) + "]"
        cols.append(
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {_RP_IN} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({signs})[i])), "
            f"(a, b) -> a + b) AS p{j:02d}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


@register(
    "embedding_random_projection",
    oracle=_rp_oracle(),
    doc="Johnson-Lindenstrauss random projection 64d -> 16d with a "
    "deterministic +-1 sign matrix (Achlioptas 2003: database-friendly "
    "random projections - sign matrices preserve pairwise distances in "
    "expectation like Gaussians at a third of the multiplies). Fully "
    "narrow: zero shuffle, zero Python - each output dim is "
    "aggregate(zip_with(vec, signs, *), 0.0, +): a SEQUENTIAL left "
    "fold whose double results are bit-identical to the oracle's "
    "list_reduce with the same seed and order. (A fully unrolled "
    "64-add chain per output was tried first: bit-identical too, but "
    "the ~2k-node expression tree cost ~4 s of per-run Catalyst/"
    "codegen overhead at ANY data size - the compact higher-order "
    "form is interpreted per row yet 5x faster end-to-end, and the "
    "constant per-query overhead is what would dominate a 100 TB "
    "job's many short tasks.) The 4x dimensionality cut feeds the ANN "
    "index (same pattern as SQ8 quantization: shrink BEFORE the "
    "O(N x Q) distance work).",
)
def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.similarity import inline_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    # one SQL parse for the 16x64 sign matrix instead of 1024 F.lit
    # py4j round-trips (identical doubles; r12 optimization)
    signs_m = inline_matrix([[float(sv) for sv in row] for row in _RP_SIGNS])
    out = [F.col("vec_id")]
    for j in range(_RP_OUT):
        signs = F.element_at(signs_m, j + 1)
        proj = F.aggregate(
            F.zip_with(F.col("embedding").cast("array<double>"), signs, lambda v, sv: v * sv),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        out.append(proj.alias(f"p{j:02d}"))
    return emb.select(*out)


# ---------------------------------------------------------------------------
# Product quantization ADC top-k
# ---------------------------------------------------------------------------

_PQ_M = 8
_PQ_SUB = 8  # 64-dim embeddings / 8 subspaces
_PQ_CODEBOOK_IDS = list(range(16))
_PQ_QUERY_ID = 42


def _pq_l2_chain(a: str, b: str) -> str:
    """Unrolled left-associated per-subspace squared-L2 chain over a
    dynamic subspace index column ``s`` — identical operation order to
    the Spark side's _sub_l2_chain (everything cast to DOUBLE before
    arithmetic; DuckDB float−float would stay single precision)."""
    terms = []
    for d in range(_PQ_SUB):
        ia = f"CAST({a}[s*{_PQ_SUB} + {d + 1}] AS DOUBLE)"
        ib = f"CAST({b}[s*{_PQ_SUB} + {d + 1}] AS DOUBLE)"
        terms.append(f"({ia} - {ib}) * ({ia} - {ib})")
    return " + ".join(terms)


def _pq_oracle() -> str:
    cbm_vals = ", ".join(f"({j}, {cid})" for j, cid in enumerate(_PQ_CODEBOOK_IDS))
    k_sub = len(_PQ_CODEBOOK_IDS)
    subs_vals = ", ".join(f"({s}, {k_sub**s})" for s in range(_PQ_M))
    return f"""
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    cbm(j, cid) AS (VALUES {cbm_vals}),
    cb AS (SELECT cbm.j, e.v AS cv FROM cbm JOIN e ON e.vec_id = cbm.cid),
    subs(s, factor) AS (VALUES {subs_vals}),
    enc AS (
      SELECT e.vec_id, subs.s, subs.factor, cb.j,
             {_pq_l2_chain("e.v", "cb.cv")} AS dist
      FROM e CROSS JOIN subs CROSS JOIN cb
    ),
    code AS (
      SELECT vec_id, s, factor, j FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
        FROM enc
      ) WHERE rn = 1
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_PQ_QUERY_ID}),
    adc AS (
      SELECT subs.s, cb.j,
             CAST(floor(({_pq_l2_chain("q.qv", "cb.cv")}) * 1000000 + 0.5) AS BIGINT) AS a
      FROM q CROSS JOIN subs CROSS JOIN cb
    ),
    scored AS (
      SELECT code.vec_id,
             CAST(sum(CAST(code.j AS BIGINT) * CAST(code.factor AS BIGINT)) AS BIGINT) AS pq_code_key,
             CAST(sum(adc.a) AS BIGINT) AS adc_micro
      FROM code JOIN adc ON adc.s = code.s AND adc.j = code.j
      GROUP BY code.vec_id
    )
    SELECT vec_id, pq_code_key, adc_micro, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY adc_micro, vec_id) AS rank FROM scored
    ) t WHERE rank <= 10
    """


@register(
    "embedding_ann_pq",
    oracle=_pq_oracle(),
    doc="Product-quantization ANN with asymmetric distance (Jégou et "
    "al. 2011, FAISS PQ): 64 dims -> 8 subspaces, 16 deterministic "
    "sample codewords each (the trainable path is what "
    "kmeans_lloyd_outliers demonstrates); encoding is a NARROW "
    "literal-inlined map (zero shuffles/joins over the corpus); the "
    "query's ADC table is integer micro-units (floor(d*1e6+0.5), no "
    "banker's-rounding trap) so the approximate distance is an exact "
    "integer sum of 8 lookups; top-10 via TakeOrdered. The oracle "
    "computes the identical chains relationally (everything cast to "
    "DOUBLE first — DuckDB float-float would stay single precision). "
    "Completes the ANN family: brute-force / LSH / IVF-flat / SQ8 / PQ.",
)
def q_embedding_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        codebook_ids=_PQ_CODEBOOK_IDS,
        query_id=_PQ_QUERY_ID,
        m=_PQ_M,
        top_n=10,
    )


_PQ_LLOYD_ITER = 1


def _pq_sub_chain(v: str, cv: str) -> str:
    """Left-associated squared-L2 chain between a FULL vector's
    subspace slice (``{v}[s*SUB + d]``, s from the joined cb row) and a
    trained SUB-vector codeword (``{cv}[d]``, already DOUBLE) —
    operation order identical to the Spark side's _sub_l2 fold."""
    terms = []
    for d in range(1, _PQ_SUB + 1):
        ia = f"CAST({v}[cb.s*{_PQ_SUB} + {d}] AS DOUBLE)"
        terms.append(f"({ia} - {cv}[{d}]) * ({ia} - {cv}[{d}])")
    return " + ".join(terms)


def _pq_lloyd_oracle(n_iter: int = _PQ_LLOYD_ITER) -> str:
    cbm_vals = ", ".join(f"({j}, {cid})" for j, cid in enumerate(_PQ_CODEBOOK_IDS))
    k_sub = len(_PQ_CODEBOOK_IDS)
    subs_vals = ", ".join(f"({s}, {k_sub**s})" for s in range(_PQ_M))
    ctes = [
        f"e AS (SELECT vec_id, embedding AS v FROM embeddings)",
        f"cbm(j, cid) AS (VALUES {cbm_vals})",
        f"subs(s, factor) AS (VALUES {subs_vals})",
        f"""cb0 AS (
      SELECT subs.s, cbm.j,
             list_transform(range(1, {_PQ_SUB} + 1),
                            d -> CAST(e.v[subs.s*{_PQ_SUB} + d] AS DOUBLE)) AS cv
      FROM cbm JOIN e ON e.vec_id = cbm.cid CROSS JOIN subs
    )""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""code{i} AS (
      SELECT vec_id, s, j FROM (
        SELECT e.vec_id, cb.s, cb.j,
               row_number() OVER (PARTITION BY e.vec_id, cb.s
                                  ORDER BY {_pq_sub_chain("e.v", "cb.cv")}, cb.j) AS rn
        FROM e CROSS JOIN cb{i - 1} cb) t
      WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""cb{i} AS (
      SELECT s, j, list(c ORDER BY d) AS cv FROM (
        SELECT s, j, d, round(sum(ival) / (count(*) * 1000000.0), 6) AS c
        FROM (
          SELECT c.s, c.j, i.d,
                 CAST(round(CAST(e.v[c.s*{_PQ_SUB} + i.d] AS DOUBLE)
                            * 1000000.0) AS BIGINT) AS ival
          FROM code{i} c JOIN e USING (vec_id) CROSS JOIN
               (SELECT unnest(range(1, {_PQ_SUB} + 1)) AS d) i) p
        GROUP BY s, j, d) g
      GROUP BY s, j
    )"""
        )
    ctes.append(
        f"""enc AS (
      SELECT vec_id, s, j FROM (
        SELECT e.vec_id, cb.s, cb.j,
               row_number() OVER (PARTITION BY e.vec_id, cb.s
                                  ORDER BY {_pq_sub_chain("e.v", "cb.cv")}, cb.j) AS rn
        FROM e CROSS JOIN cb{n_iter} cb) t
      WHERE rn = 1
    )"""
    )
    ctes.append(f"q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_PQ_QUERY_ID})")
    ctes.append(
        f"""adc AS (
      SELECT cb.s, cb.j,
             CAST(floor(({_pq_sub_chain("q.qv", "cb.cv")}) * 1000000 + 0.5) AS BIGINT) AS a
      FROM q CROSS JOIN cb{n_iter} cb
    )"""
    )
    ctes.append(
        """scored AS (
      SELECT enc.vec_id,
             CAST(sum(CAST(enc.j AS BIGINT) * CAST(subs.factor AS BIGINT)) AS BIGINT) AS pq_code_key,
             CAST(sum(adc.a) AS BIGINT) AS adc_micro
      FROM enc JOIN subs USING (s) JOIN adc ON adc.s = enc.s AND adc.j = enc.j
      GROUP BY enc.vec_id
    )"""
    )
    return (
        "WITH " + ",\n    ".join(ctes) + """
    SELECT vec_id, pq_code_key, adc_micro, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY adc_micro, vec_id) AS rank FROM scored
    ) t WHERE rank <= 10
    """
    )


@register(
    "embedding_ann_pq_lloyd",
    oracle=_pq_lloyd_oracle(),
    doc="PQ-ADC ANN with a LLOYD-TRAINED codebook (VERDICT r5 #4): the "
    "production index-build step embedding_ann_pq's deterministic "
    "sample stands in for. Each of the 8 sub-codebooks takes one "
    "unrolled Lloyd step from the sample init — squared-L2 assignment "
    "as a narrow literal-inlined map (all subspaces in one "
    "projection, zero shuffles per pass), fixed-point micro-unit "
    "means (order-independent integer sums -> oracle-exact), a "
    "1 KB-scale model collect re-inlined between passes. Encode + "
    "query ADC table then run exactly as embedding_ann_pq (each "
    "candidate struct carries its ADC value, so nearest-codeword and "
    "table lookup are one array_min); top-10 via TakeOrdered. The "
    "recall test (test_pq_lloyd_recall) pins trained recall >= sample-"
    "codebook recall against exact L2.",
)
def q_embedding_ann_pq_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import (
        collect_centroids,
        pq_adc_topk_trained,
        train_pq_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_pq_codebook(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        init_ids=_PQ_CODEBOOK_IDS,
        m=_PQ_M,
        n_iter=_PQ_LLOYD_ITER,
    )
    qvec = collect_centroids(emb, "vec_id", "embedding", [_PQ_QUERY_ID])[0]
    return pq_adc_topk_trained(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        codebook=cb,
        query_vec=qvec,
        k_sub=len(_PQ_CODEBOOK_IDS),
        top_n=10,
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted file + product quantization on residuals
# ---------------------------------------------------------------------------

_IVFPQ_CENTROID_IDS = [7 * c for c in range(8)]
_IVFPQ_N_PROBE = 2
_IVFPQ_DIM = 64


def _ivfpq_full_chain(v: str, cv: str) -> str:
    """Unrolled left-associated full-vector squared-L2 chain (64 terms)
    between a raw FLOAT vector column and an already-DOUBLE centroid
    list — the cell-assignment metric, op order identical to the Spark
    side's _sub_l2 fold over the double-cast vector."""
    terms = []
    for d in range(1, _IVFPQ_DIM + 1):
        ia = f"CAST({v}[{d}] AS DOUBLE)"
        terms.append(f"({ia} - {cv}[{d}]) * ({ia} - {cv}[{d}])")
    return " + ".join(terms)


def _ivfpq_res_chain(r: str, cw: str) -> str:
    """Left-associated per-subspace squared-L2 chain between an
    already-DOUBLE residual list (indexed by the joined cb row's
    subspace s) and a DOUBLE sub-codeword list."""
    terms = []
    for d in range(1, _PQ_SUB + 1):
        terms.append(f"({r}[cb.s*{_PQ_SUB} + {d}] - {cw}[{d}]) * ({r}[cb.s*{_PQ_SUB} + {d}] - {cw}[{d}])")
    return " + ".join(terms)


def _ivfpq_exact_chain(v: str, q: str) -> str:
    """Unrolled left-associated squared-L2 chain between two raw FLOAT
    vector columns (both CAST per element) — the exact-rerank metric."""
    terms = []
    for d in range(1, _IVFPQ_DIM + 1):
        ia = f"CAST({v}[{d}] AS DOUBLE)"
        ib = f"CAST({q}[{d}] AS DOUBLE)"
        terms.append(f"({ia} - {ib}) * ({ia} - {ib})")
    return " + ".join(terms)


def _ivfpq_scored_cte() -> str:
    cent_vals = ", ".join(f"({c}, {cid})" for c, cid in enumerate(_IVFPQ_CENTROID_IDS))
    cbm_vals = ", ".join(f"({j}, {cid})" for j, cid in enumerate(_PQ_CODEBOOK_IDS))
    k_sub = len(_PQ_CODEBOOK_IDS)
    subs_vals = ", ".join(f"({s}, {k_sub**s})" for s in range(_PQ_M))
    return f"""
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    cent(c, cid) AS (VALUES {cent_vals}),
    cc AS (
      SELECT cent.c,
             list_transform(range(1, {_IVFPQ_DIM} + 1),
                            d -> CAST(e.v[d] AS DOUBLE)) AS cv
      FROM cent JOIN e ON e.vec_id = cent.cid
    ),
    subs(s, factor) AS (VALUES {subs_vals}),
    cellof AS (
      SELECT vec_id, c FROM (
        SELECT e.vec_id, cc.c,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_ivfpq_full_chain("e.v", "cc.cv")}, cc.c) AS rn
        FROM e CROSS JOIN cc) t
      WHERE rn = 1
    ),
    res AS (
      SELECT e.vec_id, cellof.c,
             list_transform(range(1, {_IVFPQ_DIM} + 1),
                            d -> CAST(e.v[d] AS DOUBLE) - cc.cv[d]) AS r
      FROM e JOIN cellof USING (vec_id) JOIN cc ON cc.c = cellof.c
    ),
    cbm(j, cid) AS (VALUES {cbm_vals}),
    cb AS (
      SELECT subs.s, cbm.j,
             list_transform(range(1, {_PQ_SUB} + 1),
                            d -> res.r[subs.s*{_PQ_SUB} + d]) AS cw
      FROM cbm JOIN res ON res.vec_id = cbm.cid CROSS JOIN subs
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_PQ_QUERY_ID}),
    probe AS (
      SELECT c FROM (
        SELECT cc.c, row_number() OVER (
                 ORDER BY {_ivfpq_full_chain("q.qv", "cc.cv")}, cc.c) AS rn
        FROM q CROSS JOIN cc) t
      WHERE rn <= {_IVFPQ_N_PROBE}
    ),
    qres AS (
      SELECT cc.c,
             list_transform(range(1, {_IVFPQ_DIM} + 1),
                            d -> CAST(q.qv[d] AS DOUBLE) - cc.cv[d]) AS qr
      FROM q JOIN cc ON cc.c IN (SELECT c FROM probe)
    ),
    adc AS (
      SELECT qres.c, cb.s, cb.j,
             CAST(floor(({_ivfpq_res_chain("qres.qr", "cb.cw")}) * 1000000 + 0.5) AS BIGINT) AS a
      FROM qres CROSS JOIN cb
    ),
    enc AS (
      SELECT vec_id, c, s, j FROM (
        SELECT res.vec_id, res.c, cb.s, cb.j,
               row_number() OVER (PARTITION BY res.vec_id, cb.s
                                  ORDER BY {_ivfpq_res_chain("res.r", "cb.cw")}, cb.j) AS rn
        FROM res CROSS JOIN cb
        WHERE res.c IN (SELECT c FROM probe)) t
      WHERE rn = 1
    ),
    scored AS (
      SELECT enc.vec_id, CAST(enc.c AS INT) AS cell,
             CAST(sum(CAST(enc.j AS BIGINT) * CAST(subs.factor AS BIGINT)) AS BIGINT) AS pq_code_key,
             CAST(sum(adc.a) AS BIGINT) AS adc_micro
      FROM enc JOIN subs USING (s) JOIN adc ON adc.c = enc.c AND adc.s = enc.s AND adc.j = enc.j
      GROUP BY enc.vec_id, enc.c
    )"""


def _ivfpq_oracle() -> str:
    return f"""
    {_ivfpq_scored_cte()}
    SELECT vec_id, cell, pq_code_key, adc_micro, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY adc_micro, vec_id) AS rank FROM scored
    ) t WHERE rank <= 10
    """


_IVFPQ_K_SHORTLIST = 50


def _ivfpq_rerank_oracle() -> str:
    return f"""
    {_ivfpq_scored_cte()},
    shortlist AS (
      SELECT vec_id, cell, adc_micro, CAST(rank AS BIGINT) AS adc_rank FROM (
        SELECT *, row_number() OVER (ORDER BY adc_micro, vec_id) AS rank
        FROM scored
      ) t WHERE rank <= {_IVFPQ_K_SHORTLIST}
    ),
    rer AS (
      SELECT s.vec_id, s.cell, s.adc_micro, s.adc_rank,
             CAST(floor(({_ivfpq_exact_chain("e.v", "q.qv")}) * 1000000 + 0.5)
                  AS BIGINT) AS exact_micro
      FROM shortlist s JOIN e ON e.vec_id = s.vec_id CROSS JOIN q
    )
    SELECT vec_id, cell, adc_micro, adc_rank, exact_micro,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY exact_micro, vec_id) AS rank
      FROM rer
    ) t WHERE rank <= 10
    """


@register(
    "embedding_ann_ivfpq",
    oracle=_ivfpq_oracle(),
    doc="IVF-PQ ANN (Jégou et al. 2011 §V; the FAISS IVFPQ index "
    "deployed at billion-vector scale): a coarse 8-cell inverted file "
    "prunes the scan to n_probe=2 cells, and PQ runs on the RESIDUAL "
    "v - centroid(cell) — the composition of the certified IVF-flat "
    "and PQ-ADC parts. Cell assignment and residual encode are narrow "
    "literal-inlined maps (zero shuffle); the query gets a separate "
    "integer micro-unit ADC table per probed cell (its residual "
    "differs per cell); top-10 via TakeOrdered over the probed "
    "fraction only. The oracle replays every chain relationally with "
    "identical left-associated IEEE op order.",
)
def q_embedding_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        query_id=_PQ_QUERY_ID,
        centroid_ids=_IVFPQ_CENTROID_IDS,
        codebook_ids=_PQ_CODEBOOK_IDS,
        m=_PQ_M,
        n_probe=_IVFPQ_N_PROBE,
        top_n=10,
    )


@register(
    "embedding_ann_ivfpq_rerank",
    oracle=_ivfpq_rerank_oracle(),
    doc="Two-stage ANN: IVF-PQ ADC shortlist (50) + EXACT re-rank of "
    "only the shortlisted original vectors — FAISS's IVFPQR / "
    "'IVFADC+R' refinement (Jégou et al. 2011 §VI), the architecture "
    "that recovers PQ's lost recall without brute-forcing the corpus. "
    "The <=50-row shortlist is BROADCAST back against the corpus scan "
    "(no shuffle of the corpus at any scale); exact distances use the "
    "same left-associated fold and integer micro-units as the ADC "
    "stage, so the refinement's re-ordering is itself oracle-checked "
    "(adc_rank vs rank).",
)
def q_embedding_ann_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_anomaly_spark.operators.similarity import ivf_pq_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_rerank_topk(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        query_id=_PQ_QUERY_ID,
        centroid_ids=_IVFPQ_CENTROID_IDS,
        codebook_ids=_PQ_CODEBOOK_IDS,
        m=_PQ_M,
        n_probe=_IVFPQ_N_PROBE,
        k_shortlist=_IVFPQ_K_SHORTLIST,
        top_n=10,
    )


# ---------------------------------------------------------------------------
# Matryoshka truncated-dimension recall
# ---------------------------------------------------------------------------

_MRL_DIMS = [8, 16, 32]
_MRL_QUERIES = list(range(10))
_MRL_K = 10


def _mrl_topk_cte(name: str, d: int) -> str:
    """Top-k-per-query CTE over the first ``d`` embedding components
    (the arrays are indexed, not sliced — same arithmetic as Spark's
    F.slice + fold, left-associated, rounded to 6 pre-rank)."""
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, {d} + 1),"
        " i -> CAST(qvec[i] AS DOUBLE) * CAST(nvec[i] AS DOUBLE))),"
        " (a,b) -> a+b)"
    )
    nq = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, {d} + 1),"
        " i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))),"
        " (a,b) -> a+b))"
    )
    nn = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, {d} + 1),"
        " i -> CAST(nvec[i] AS DOUBLE) * CAST(nvec[i] AS DOUBLE))),"
        " (a,b) -> a+b))"
    )
    return f"""
    {name} AS (
      SELECT qid, nid FROM (
        SELECT q.qid, c.nid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round({dot} / ({nq} * {nn}), 6) DESC, c.nid ASC) AS rn
        FROM (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
              WHERE vec_id < {len(_MRL_QUERIES)}) q
        JOIN (SELECT vec_id AS nid, embedding AS nvec FROM embeddings) c
          ON c.nid != q.qid) t
      WHERE rn <= {_MRL_K})"""


def _mrl_oracle() -> str:
    ctes = [_mrl_topk_cte("full64", 64)] + [
        _mrl_topk_cte(f"top{d}", d) for d in _MRL_DIMS
    ]
    selects = [
        f"""
    SELECT CAST({d} AS BIGINT) AS dims,
           round(sum(CASE WHEN t.nid IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS recall_at_10
    FROM full64 f LEFT JOIN top{d} t ON f.qid = t.qid AND f.nid = t.nid"""
        for d in _MRL_DIMS
    ]
    return "WITH " + ",".join(ctes) + (" UNION ALL ".join(selects))


@register(
    "ann_matryoshka_recall",
    oracle=_mrl_oracle(),
    doc="Matryoshka-embedding evaluation (Kusupati et al. 2022): "
    "recall@10 of exact cosine search using only the first 8/16/32 "
    "embedding components vs the full 64 — the measurement that "
    "decides how much of a 100 TB vector corpus can be served from a "
    "prefix index (2-8x memory/IO cut). Each truncated search is the "
    "same broadcast-query brute-force plan over F.slice'd vectors; "
    "the three one-row recall aggregates union at the tail.",
)
def q_ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_anomaly_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    full = brute_force_topk(
        emb, id_col="vec_id", vec_col="embedding", query_ids=_MRL_QUERIES, k=_MRL_K
    ).select("qid", "nid")
    parts = []
    for d in _MRL_DIMS:
        part = (
            brute_force_topk(
                emb,
                id_col="vec_id",
                vec_col="embedding",
                query_ids=_MRL_QUERIES,
                k=_MRL_K,
                dims=d,
            )
            .select("qid", "nid")
            .withColumn("__hit", F.lit(1))
        )
        r = (
            full.join(part, ["qid", "nid"], "left")
            .agg(
                F.round(
                    F.sum(F.coalesce(F.col("__hit"), F.lit(0))) * 1.0 / F.count("*"),
                    4,
                ).alias("recall_at_10")
            )
            .select(F.lit(d).cast("bigint").alias("dims"), "recall_at_10")
        )
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
