"""Semantic (embedding-space) corpus operators.

Extends the similarity family (operators/similarity.py) with the three
remaining embedding-pipeline stages a pretraining corpus needs:

- `decontaminate_embedding`: semantic benchmark decontamination — flag
  training vectors too close (cosine) to any eval vector. The embedding
  analog of the shingle-based `decontaminate_vs_eval`
  (operators/dedup.py): catches paraphrased eval leakage that exact
  n-gram overlap misses.
- `embedding_centroid_cohesion`: per-label centroid + cohesion profile
  — the cluster-quality audit run after any corpus clustering /
  stratification step.
- `sim_knn_pq`: product-quantization ANN with asymmetric distance
  computation (ADC) — the memory-side compression counterpart to the
  IVF partition pruning in `sim_knn_ivf` (Jégou et al., "Product
  Quantization for Nearest Neighbor Search", TPAMI 2011).

Reference scope note: the reference (/root/reference, 253 lines of
Snowflake SQL over IMDB CSVs) has no vector surface; these operators
are the driver-contract north-star extensions (BASELINE.json), built
on public PySpark + the published PQ/IVF literature only.

Float policy (shared with operators/similarity.py): accumulate dot
products in float64, round similarities/distances to 6 decimals before
any ranking or thresholding so accumulation-order ulp noise can never
order differently per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _imdb_etl_spark.operators.similarity import _cos_sql, _dot
from _imdb_etl_spark.plans.registry import register
from _imdb_etl_spark.sources import load_tables, spread

_DIM = 64
_N_EVAL = 10  # vec_id < 10 are the held-out eval vectors
_DECONTAM_TAU = 0.30

_DECONTAM_EMB_SQL = f"""
WITH ev AS (SELECT vec_id AS eval_id, embedding AS qe FROM embeddings
            WHERE vec_id < {_N_EVAL}),
scored AS (
  SELECT e.vec_id, ev.eval_id,
         ROUND({_cos_sql('ev.qe', 'e.embedding')}, 6) AS cos_sim
  FROM embeddings e CROSS JOIN ev
  WHERE e.vec_id >= {_N_EVAL}
)
SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
       MAX(cos_sim) AS max_sim
FROM scored
WHERE cos_sim >= {_DECONTAM_TAU}
GROUP BY vec_id
ORDER BY vec_id
"""


@register(
    "decontaminate_embedding",
    _DECONTAM_EMB_SQL,
    doc=f"Semantic decontamination: training vectors with cosine >= "
    f"{_DECONTAM_TAU} to ANY eval vector (vec_id < {_N_EVAL}) are "
    "flagged with hit count and max similarity. The eval set is tiny "
    "by construction, so it broadcasts and the 100 TB corpus scan "
    "stays map-side (scan -> per-row k-way dot products -> filter) — "
    "one shuffle only for the per-vector hit aggregation, keyed on "
    "vec_id. Catches paraphrase-level eval leakage that the "
    "shingle-overlap filter (decontaminate_vs_eval) cannot.",
)
def decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    normed = emb.select(
        "vec_id", "embedding", F.sqrt(_dot("embedding", "embedding")).alias("nrm")
    )
    ev = normed.where(F.col("vec_id") < _N_EVAL).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        normed.where(F.col("vec_id") >= _N_EVAL)
        .crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("qe"), F.col("embedding"))
                / (F.col("qnrm") * F.col("nrm")),
                6,
            ).alias("cos_sim"),
        )
    )
    return (
        scored.where(F.col("cos_sim") >= _DECONTAM_TAU)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("cos_sim").alias("max_sim"),
        )
        .orderBy("vec_id")
    )


# --- per-label centroid + cohesion -----------------------------------
#
# Centroid components are rounded to 6 decimals BEFORE the member
# cosines are taken, so both engines measure against the bitwise-same
# centroid; member cosines are rounded before averaging, and the final
# mean again — the standard accumulate-f64 / round-at-boundaries
# policy.

_COHESION_SQL = f"""
WITH comp AS (
  SELECT label, j, ROUND(AVG(CAST(embedding[j] AS DOUBLE)), 6) AS m
  FROM embeddings, range(1, {_DIM} + 1) t(j)
  GROUP BY label, j
),
cent AS (SELECT label, list(m ORDER BY j) AS c FROM comp GROUP BY label),
member AS (
  SELECT e.label,
         ROUND({_cos_sql('e.embedding', 'cent.c')}, 6) AS cos_c
  FROM embeddings e JOIN cent USING (label)
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(cos_c), 6) AS mean_cohesion,
       MIN(cos_c) AS min_cohesion
FROM member
GROUP BY label
ORDER BY label
"""


@register(
    "embedding_centroid_cohesion",
    _COHESION_SQL,
    doc="Cluster-quality audit: per-label mean embedding (centroid) "
    "via posexplode -> two-phase avg keyed (label, dim) — the "
    "feature-index explode pattern: 64x row blow-up is map-side only, "
    "partial aggregation shrinks it to labels x 64 before the shuffle "
    "— then each member's cosine to its (rounded) centroid, "
    "aggregated to n_vecs / mean / min cohesion per label. The "
    "centroid table is bounded by the label count, so the member-side "
    "join broadcasts at any corpus size.",
)
def embedding_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    comp = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("c")
    )
    member = emb.join(F.broadcast(cent), "label").select(
        "label",
        F.round(
            _dot(F.col("embedding"), F.col("c"))
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(F.col("c"), F.col("c")))
            ),
            6,
        ).alias("cos_c"),
    )
    return (
        member.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos_c"), 6).alias("mean_cohesion"),
            F.min("cos_c").alias("min_cohesion"),
        )
        .orderBy("label")
    )


# --- product-quantization ANN (ADC) ----------------------------------

_N_SUB = 16  # subspaces (4-dim subvectors: finer grain, higher recall)
_SUB_DIM = _DIM // _N_SUB
_N_CODES = 64  # codebook entries per subspace
_PQ_TOP_K = 5
_N_QUERIES = 8  # vec_id < 8 query the index (same convention as sim_knn_*)
# deterministic codebook seeds: both engines pick the same 64 corpus
# vectors by a pure expression (real deployments train per-subspace
# k-means; deterministic picks keep the operator oracle-checkable,
# mirroring sim_knn_ivf's centroid convention). 16 subspaces x 64
# codes measures recall@5 = 0.55 vs brute force at sf0.01 — above the
# KMeans-trained IVF's 0.38 — while compressing 256 fp32 bytes to 16
# code bytes.
_SEED_FILTER = "vec_id % 7 = 1"

_SUB_SLICE = "list_slice({v}, {s} * {sd} + 1, {s} * {sd} + {sd})"

_SUB_DOT_T = (
    f"list_sum(list_transform(range(1, {_SUB_DIM} + 1),"
    " j -> CAST({a}[j] AS DOUBLE) * CAST({b}[j] AS DOUBLE)))"
)
_SUB_L2_T = (
    f"list_sum(list_transform(range(1, {_SUB_DIM} + 1),"
    " j -> (CAST({a}[j] AS DOUBLE) - CAST({b}[j] AS DOUBLE))"
    " * (CAST({a}[j] AS DOUBLE) - CAST({b}[j] AS DOUBLE))))"
)

# shared encode/LUT CTE block: the PQ codebook (deterministic seeds x
# subspace slices), per-vector code assignment, and the per-query
# dot-product lookup table — used verbatim by sim_knn_pq and sim_knn_ivfpq
_PQ_CTES = f"""
seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code_id, embedding
  FROM embeddings WHERE {_SEED_FILTER}
  ORDER BY vec_id LIMIT {_N_CODES}
),
subs AS (SELECT unnest(range(0, {_N_SUB})) AS s),
codebook AS (
  SELECT s, code_id,
         {_SUB_SLICE.format(v='embedding', s='s', sd=_SUB_DIM)} AS cs
  FROM seeds CROSS JOIN subs
),
vec_subs AS (
  SELECT vec_id, s,
         {_SUB_SLICE.format(v='embedding', s='s', sd=_SUB_DIM)} AS vs
  FROM embeddings CROSS JOIN subs
),
encoded AS (
  -- rank key (rounded L2, RAW L2, code_id): the raw tie-break mirrors
  -- the GEMM encode kernel's lexsort (see _pq_encode_lut) so a raw
  -- distance at a 0.5e-6 rounding boundary can never flip the code
  -- assignment between engines
  SELECT vec_id, s, code_id FROM (
    SELECT vec_id, s, code_id,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id, s
             ORDER BY ROUND(d_raw, 6), d_raw, code_id
           ) AS rnk
    FROM (
      SELECT v.vec_id, v.s, cb.code_id,
             {_SUB_L2_T.format(a='v.vs', b='cb.cs')} AS d_raw
      FROM vec_subs v JOIN codebook cb ON v.s = cb.s
    )
  ) WHERE rnk = 1
),
lut AS (
  SELECT q.vec_id AS query_id, cb.s, cb.code_id,
         ROUND({_SUB_DOT_T.format(a='q.vs', b='cb.cs')}, 6) AS part
  FROM vec_subs q JOIN codebook cb ON q.s = cb.s
  WHERE q.vec_id < {_N_QUERIES}
)"""


def _pq_sql() -> str:
    return f"""
WITH {_PQ_CTES},
scored AS (
  SELECT l.query_id, e.vec_id AS neighbor_id,
         ROUND(SUM(part), 6) AS approx_dot
  FROM encoded e JOIN lut l ON e.s = l.s AND e.code_id = l.code_id
  WHERE e.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, approx_dot, rnk AS neighbor_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY approx_dot DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= {_PQ_TOP_K}
ORDER BY query_id, neighbor_rank
"""


def _pq_encode_lut(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared PQ build: (encoded, lut) — the Spark twin of _PQ_CTES.

    encoded: (vec_id, s, code_id) — every vector's nearest code per
    subspace. lut: (query_id, s, code_id, part) — each query's dot
    product against every codebook entry. Used verbatim by sim_knn_pq
    and sim_knn_ivfpq so their quantization semantics can never drift
    apart (the SQL side shares the same block for the same reason).

    Round 11: the corpus-side encode is GEMM-batched
    (_pq_encode_gemm) — the previous expression route fanned every
    vector out to N x _N_SUB x _N_CODES (N x 1024) rows and ranked
    them in a window keyed (vec_id, s), which was the PQ family's
    dominant stage at 1000x (~30x the data bytes shuffled twice). The
    expression route survives as _pq_encode_expression, pinned
    output-equal by test_pq_encode_gemm_matches_expression_route —
    the same demotion pattern as dedup_embedding_ivf. The LUT side
    stays expression-based: it touches only the _N_QUERIES query
    vectors x the broadcast codebook (a few thousand rows)."""
    encoded = _pq_encode_gemm(emb)
    lut = _pq_query_lut(emb)
    return encoded, lut


def _pq_codebook(emb: DataFrame) -> DataFrame:
    """The deterministic-seed PQ codebook: (s, code_id, cs) — shared
    by the LUT builder and the expression-route encode twin."""
    # subspace fan-out via explode of a literal index array — a narrow
    # map-side op, NOT a join: no nested-loop node ever enters the plan
    subs = F.explode(F.array(*[F.lit(s) for s in range(_N_SUB)])).alias("s")
    seed_w = Window.orderBy("vec_id")
    seeds = (
        emb.where(F.expr(_SEED_FILTER))
        .orderBy("vec_id")
        .limit(_N_CODES)
        # global window over exactly <= _N_CODES post-limit rows — the
        # single-task WindowExec warning is benign by construction
        .withColumn("code_id", F.row_number().over(seed_w) - 1)
    )
    sub_slice = _pq_sub_slice
    return seeds.select("code_id", "embedding", subs).select(
        "s", "code_id", sub_slice(F.col("embedding")).alias("cs")
    )


def _pq_sub_slice(v):
    return F.slice(v, F.col("s") * _SUB_DIM + 1, _SUB_DIM)


def _pq_vec_subs(emb: DataFrame) -> DataFrame:
    """Per-vector subspace slices (vec_id, s, vs) — the fan-out side
    of the expression-route encode and the (query-only) LUT build."""
    subs = F.explode(F.array(*[F.lit(s) for s in range(_N_SUB)])).alias("s")
    return emb.select("vec_id", "embedding", subs).select(
        "vec_id", "s", _pq_sub_slice(F.col("embedding")).alias("vs")
    )


def _pq_query_lut(emb: DataFrame) -> DataFrame:
    """(query_id, s, code_id, part): each query's exact dot product
    against every codebook entry — _N_QUERIES x _N_SUB x _N_CODES rows
    (a few thousand), broadcast downstream. Stays expression-based:
    the fan-out is bounded by the query count, never the corpus."""
    codebook = _pq_codebook(emb)
    return (
        _pq_vec_subs(emb)
        .where(F.col("vec_id") < _N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "s")
        .select(
            "query_id",
            "s",
            "code_id",
            F.round(_dot(F.col("vs"), F.col("cs")), 6).alias("part"),
        )
    )


def _pq_encode_expression(emb: DataFrame) -> DataFrame:
    """The expression-route PQ encode — fan every vector out to
    N x _N_SUB subspace rows, join the broadcast codebook
    (x _N_CODES), rank the L2 distances in a window keyed (vec_id,
    s). This is the bitwise-parity REFERENCE for the registered GEMM
    encode (_pq_encode_gemm), pinned output-equal by
    test_pq_encode_gemm_matches_expression_route — NOT the volume
    path: the N x 1024 intermediate made it the PQ family's dominant
    stage at 1000x. Rank key (rounded L2, RAW L2, code_id) matches
    the oracle's encoded CTE and the GEMM kernel's lexsort."""
    codebook = _pq_codebook(emb)
    l2 = F.aggregate(
        F.zip_with(
            F.col("vs"),
            F.col("cs"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    enc_w = Window.partitionBy("vec_id", "s").orderBy("d", "d_raw", "code_id")
    return (
        _pq_vec_subs(emb)
        .join(F.broadcast(codebook), "s")
        .select(
            "vec_id", "s", "code_id", l2.alias("d_raw"), F.round(l2, 6).alias("d")
        )
        .withColumn("rnk", F.row_number().over(enc_w))
        .where(F.col("rnk") == 1)
        .select("vec_id", "s", "code_id")
    )


# GEMM sub-chunk size — same sizing rationale as similarity.py's
# assignment kernel: the (rows x _N_SUB x _N_CODES x _SUB_DIM) diff
# tensor at 1024 rows is ~33 MB/task transient; a full 10k-row Arrow
# batch would be ~330 MB/task x 32 concurrent tasks.
_ENC_CHUNK = 1024


def _pq_codebook_np(emb: DataFrame):
    """The deterministic-seed codebook as a numpy (s, code_id,
    sub_dim) tensor — a bounded driver readback of <= _N_CODES rows.
    code_id = rank in vec_id order, exactly the oracle's
    ROW_NUMBER() OVER (ORDER BY vec_id) - 1."""
    import numpy as np

    seed_rows = sorted(
        emb.where(F.expr(_SEED_FILTER))
        .orderBy("vec_id")
        .limit(_N_CODES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    return (
        np.array([list(r.embedding) for r in seed_rows], dtype=np.float64)
        .reshape(len(seed_rows), _N_SUB, _SUB_DIM)
        .transpose(1, 0, 2)
        .copy()
    )


def _pq_encode_gemm(emb: DataFrame) -> DataFrame:
    """The registered PQ encode: one Arrow-batched mapInPandas pass
    computing every vector's per-subspace argmin code against the
    broadcast codebook tensor — zero shuffled rows (the expression
    route shuffled N x _N_SUB x _N_CODES rows through a window; at
    1000x that stage dominated the whole PQ family).

    Engine parity: the squared-diff sum runs over the _SUB_DIM(=4)
    contiguous last axis, which numpy reduces SEQUENTIALLY (pairwise
    blocking starts above 8 elements) — the identical order to
    Spark's F.aggregate fold and DuckDB's list_sum, so raw distances
    are bit-equal across all three engines. The rank key still
    carries the raw L2 between the rounded L2 and the code id
    (lexsort), mirroring the oracle's encoded CTE, so even an
    order-divergent future kernel could not flip a boundary
    assignment. Ties at identical raw L2 break by ascending code id
    == ascending column index (stable lexsort)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    cb = _pq_codebook_np(emb)
    bc = emb.sparkSession.sparkContext.broadcast(cb)

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("s", IntegerType()),
            StructField("code_id", IntegerType()),
        ]
    )
    s_tile = np.arange(_N_SUB, dtype=np.int32)

    def encode(batches):
        cbv = bc.value  # (S, C, D)
        for pdf in batches:
            for lo in range(0, len(pdf), _ENC_CHUNK):
                sub = pdf.iloc[lo : lo + _ENC_CHUNK]
                if sub.empty:
                    continue
                v = (
                    np.stack(sub["embedding"].to_numpy())
                    .astype(np.float64)
                    .reshape(-1, _N_SUB, 1, _SUB_DIM)
                )
                d_raw = ((v - cbv[None, :, :, :]) ** 2).sum(axis=-1)  # (n,S,C)
                d_key = np.floor(d_raw * 1e6 + 0.5) / 1e6  # half-up, d_raw >= 0
                order = np.lexsort((d_raw, d_key), axis=-1)
                codes = order[:, :, 0].astype(np.int32)  # (n, S)
                n = codes.shape[0]
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(
                            sub["vec_id"].to_numpy(dtype=np.int64), _N_SUB
                        ),
                        "s": np.tile(s_tile, n),
                        "code_id": codes.ravel(),
                    }
                )

    return emb.select("vec_id", "embedding").mapInPandas(encode, out_schema)



@register(
    "sim_knn_pq",
    _pq_sql(),
    doc=f"Product-quantization ANN with asymmetric distance computation "
    f"(Jégou et al. 2011): {_N_SUB} subspaces x {_N_CODES}-entry "
    "codebooks; every corpus vector compresses to "
    f"{_N_SUB} code ids ({_N_SUB} bytes vs {_DIM * 4} for fp32 — the "
    "RAM-side compression that complements IVF's partition pruning; "
    "recall@5 = 0.55 vs brute force at sf0.01, above trained IVF's "
    "0.38). "
    "Queries precompute a dot-product lookup table against the "
    "codebook (queries x subspaces x codes rows — broadcastable by "
    "construction), scoring is a broadcast-LUT join + per-(query, "
    "vector) partial-agg sum, never touching raw corpus floats. The "
    "corpus-side encode argmin is one Arrow-batched mapInPandas GEMM "
    "pass against the broadcast codebook tensor (zero shuffled rows); "
    "the windowed-rank expression route survives as the bitwise-"
    "parity twin, pinned output-equal in pytest alongside the "
    "recall-vs-exact floor.",
)
def sim_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    scored = _pq_adc_topk_gemm(emb)
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("neighbor_rank", F.row_number().over(rank_w))
        .where(F.col("neighbor_rank") <= _PQ_TOP_K)
        .orderBy("query_id", "neighbor_rank")
    )


def _pq_scored_join_route(emb: DataFrame) -> DataFrame:
    """The join-route ADC scoring twin — encode rows joined to the
    broadcast LUT, summed per (query, neighbor). This is the parity
    REFERENCE for the fused kernel (_pq_adc_topk_gemm), pinned
    output-equal by test_pq_adc_gemm_matches_join_route — NOT the
    volume path: the LUT join fans the corpus out to
    N x _N_SUB x _N_QUERIES rows before the partial agg, which was
    sim_knn_pq's dominant stage once the encode went GEMM."""
    encoded, lut = _pq_encode_lut(emb)
    return (
        encoded.join(F.broadcast(lut), ["s", "code_id"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("part"), 6).alias("approx_dot"))
    )


def _pq_adc_topk_gemm(emb: DataFrame) -> DataFrame:
    """Fused PQ encode + ADC score + per-chunk top-k prune in ONE
    Arrow-batched mapInPandas pass: (query_id, neighbor_id,
    approx_dot), pruned to each chunk's top _PQ_TOP_K per query.

    Per chunk: encode the vectors against the broadcast codebook
    tensor (the _pq_encode_gemm argmin, identical rank key), gather
    each query's LUT entry for the assigned code per subspace, and
    accumulate the 16 parts SEQUENTIALLY in subspace order. The LUT is
    built driver-side from the _N_QUERIES query vectors (a bounded
    readback, the centroid-collect precedent) with the identical
    rounding as the lut CTE: part = ROUND(4-element sequential dot, 6).

    The per-chunk prune is row_number-safe: the global top-k rows by
    (approx_dot DESC, neighbor_id ASC) each rank within the top k of
    their own chunk under the same key, so the union of per-chunk
    top-k is a superset of the global top-k — the same argument
    WindowGroupLimit uses for per-partition limits. Emitted volume is
    ~(N / chunk) x _N_QUERIES x k rows instead of N x _N_QUERIES,
    so the downstream window is negligible at any scale."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cb = _pq_codebook_np(emb)  # (S, C, D)
    q_rows = sorted(
        emb.where(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    qids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    qmat = (
        np.array([list(r.embedding) for r in q_rows], dtype=np.float64)
        .reshape(len(q_rows), _N_SUB, 1, _SUB_DIM)
    )
    # lut[q, s, c] = ROUND(dot(query_sub, code_sub), 6) — the 4-element
    # product-sum reduces sequentially (numpy pairwise blocking starts
    # above 8 elements), the identical order to the lut CTE's list_sum
    # and the Spark LUT's F.aggregate fold
    lut_raw = (qmat * cb[None, :, :, :]).sum(axis=-1)  # (Q, S, C)
    # half-away-from-zero to match the lut CTE's ROUND (ADVICE r11),
    # not np.round's half-even: these parts sum into EMITTED approx_dot
    lut = np.copysign(np.floor(np.abs(lut_raw) * 1e6 + 0.5), lut_raw) / 1e6
    bc = emb.sparkSession.sparkContext.broadcast((cb, lut, qids))

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("approx_dot", DoubleType()),
        ]
    )
    top_k = _PQ_TOP_K

    def score(batches):
        cbv, lutv, qv = bc.value
        n_q = len(qv)
        for pdf in batches:
            for lo in range(0, len(pdf), _ENC_CHUNK):
                sub = pdf.iloc[lo : lo + _ENC_CHUNK]
                if sub.empty:
                    continue
                v = (
                    np.stack(sub["embedding"].to_numpy())
                    .astype(np.float64)
                    .reshape(-1, _N_SUB, 1, _SUB_DIM)
                )
                d_raw = ((v - cbv[None, :, :, :]) ** 2).sum(axis=-1)
                d_key = np.floor(d_raw * 1e6 + 0.5) / 1e6  # half-up, d_raw >= 0
                order = np.lexsort((d_raw, d_key), axis=-1)
                codes = order[:, :, 0]  # (n, S)
                n = codes.shape[0]
                # ADC: accumulate the _N_SUB parts sequentially in
                # subspace order (ROUND(SUM(part), 6) downstream)
                scores = np.zeros((n, n_q), dtype=np.float64)
                for s in range(_N_SUB):
                    scores += lutv[:, s, codes[:, s]].T
                scores = np.copysign(np.floor(np.abs(scores) * 1e6 + 0.5), scores) / 1e6
                nids = sub["vec_id"].to_numpy(dtype=np.int64)
                parts = []
                for qi in range(n_q):
                    col = scores[:, qi]
                    keep = nids != qv[qi]  # a query never matches itself
                    if not keep.any():
                        continue
                    cand_n, cand_s = nids[keep], col[keep]
                    sel = np.lexsort((cand_n, -cand_s))[:top_k]
                    parts.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(
                                    len(sel), qv[qi], dtype=np.int64
                                ),
                                "neighbor_id": cand_n[sel],
                                "approx_dot": cand_s[sel],
                            }
                        )
                    )
                if parts:
                    yield pd.concat(parts, ignore_index=True)

    return emb.select("vec_id", "embedding").mapInPandas(score, out_schema)


# --- IVF + PQ: the production ANN index shape ------------------------

_IVFPQ_TOP_K = 5


def _ivfpq_sql() -> str:
    return f"""{_ivfpq_scored_ctes()}
SELECT query_id, neighbor_id, approx_dot, rnk AS neighbor_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY approx_dot DESC, neighbor_id) AS rnk
  FROM scored
)
WHERE rnk <= {_IVFPQ_TOP_K}
ORDER BY query_id, neighbor_rank
"""


def _ivfpq_scored_ctes() -> str:
    """The shared CTE chain through `scored` (and the norm table `n`)
    — ONE definition for the ADC top-k oracle and the refined oracle,
    mirroring the Spark-side _ivfpq_scored split."""
    from _imdb_etl_spark.operators.similarity import (
        _CENTROID_FILTER,
        _N_CENTROIDS,
        _N_PROBE,
    )

    return f"""
WITH {_PQ_CTES},
n AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_SQL_FULL.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
c AS (
  SELECT vec_id AS centroid_id, embedding AS ce,
         sqrt({_DOT_SQL_FULL.format(a='embedding', b='embedding')}) AS cnrm
  FROM embeddings WHERE {_CENTROID_FILTER}
  ORDER BY vec_id LIMIT {_N_CENTROIDS}
),
assign AS (
  -- rank key (rounded sim, RAW sim, centroid_id): the raw tie-break
  -- mirrors the GEMM kernel's lexsort (see _ivf_assign_gemm) so a
  -- BLAS-vs-list_sum ulp at a rounding boundary can never flip the
  -- assignment between engines
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY ROUND(sim_raw, 6) DESC, sim_raw DESC, centroid_id) AS arnk
  FROM (
    SELECT n.vec_id, c.centroid_id,
           ({_DOT_SQL_FULL.format(a='n.embedding', b='c.ce')})
                 / (n.nrm * c.cnrm) AS sim_raw
    FROM n CROSS JOIN c
  )
),
lists AS (SELECT vec_id, centroid_id FROM assign WHERE arnk = 1),
probes AS (SELECT vec_id AS query_id, centroid_id
           FROM assign WHERE vec_id < {_N_QUERIES} AND arnk <= {_N_PROBE}),
cand AS (
  SELECT p.query_id, l.vec_id AS neighbor_id
  FROM probes p JOIN lists l ON p.centroid_id = l.centroid_id
  WHERE l.vec_id <> p.query_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         ROUND(SUM(lt.part), 6) AS approx_dot
  FROM cand cd
  JOIN encoded e ON e.vec_id = cd.neighbor_id
  JOIN lut lt ON lt.query_id = cd.query_id
             AND lt.s = e.s AND lt.code_id = e.code_id
  GROUP BY 1, 2
)"""


_DOT_SQL_FULL = (
    f"list_sum(list_transform(range(1, {_DIM} + 1),"
    " j -> CAST({a}[j] AS DOUBLE) * CAST({b}[j] AS DOUBLE)))"
)


@register(
    "sim_knn_ivfpq",
    None,  # oracle installed below (_ivfpq_sql imports from similarity)
    doc="IVF+PQ composed index — the FAISS-style production ANN shape: "
    "IVF inverted lists prune the candidate set to the probed lists "
    "(pair work corpus/centroids per probe), then PQ asymmetric "
    "distance ranks candidates from 16-byte codes via the broadcast "
    "lookup table — raw corpus floats are never touched at query "
    "time. Memory per vector: 16 code bytes + a list id; both the "
    "coarse quantizer and the codebooks are deterministic picks so "
    "the whole index is oracle-checkable; recall-vs-exact floor "
    "pinned in pytest.",
)
def sim_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    scored = _ivfpq_scored(emb)
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("neighbor_rank", F.row_number().over(rank_w))
        .where(F.col("neighbor_rank") <= _IVFPQ_TOP_K)
        .orderBy("query_id", "neighbor_rank")
    )


def _ivfpq_scored(emb: DataFrame) -> DataFrame:
    """The shared IVF-prune + PQ-ADC scoring stage: (query_id,
    neighbor_id, approx_dot) for every candidate in a probed list.
    Split out so the plain ADC top-k face and the exact-re-rank face
    (sim_knn_ivfpq_refined) can never drift on index semantics."""
    from _imdb_etl_spark.operators.similarity import (
        _CENTROID_FILTER,
        _N_CENTROIDS,
        _N_PROBE,
    )

    normed = emb.select(
        "vec_id", "embedding", F.sqrt(_dot("embedding", "embedding")).alias("nrm")
    )
    # Coarse quantization is GEMM-batched (round 11): the previous
    # route crossJoined every vector with the broadcast centroid table
    # and ranked the N x k rows in a window keyed vec_id — N x k rows
    # shuffled for an assignment whose output is N rows. One batched
    # matmul per Arrow chunk against the broadcast centroid matrix
    # (the proven kernel shape from similarity.ivf_inverted_lists)
    # does the same dots with zero shuffled rows.
    assign = _ivf_assign_gemm(normed)
    lists = assign.where(F.col("arnk") == 1).select("centroid_id", "vec_id")
    probes = assign.where(
        (F.col("vec_id") < _N_QUERIES) & (F.col("arnk") <= _N_PROBE)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("centroid_id").alias("probe_centroid_id"),
    )
    cand = (
        F.broadcast(probes)
        .join(lists, F.col("probe_centroid_id") == F.col("centroid_id"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    # PQ side: the exact shared encode/LUT builder from sim_knn_pq
    encoded, lut = _pq_encode_lut(emb)
    encoded = encoded.withColumnRenamed("vec_id", "neighbor_id")
    return (
        cand.join(encoded, "neighbor_id")
        .join(F.broadcast(lut), ["query_id", "s", "code_id"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("part"), 6).alias("approx_dot"))
    )


def _ivf_assign_gemm(normed: DataFrame) -> DataFrame:
    """GEMM-batched IVF coarse quantization for the PQ family:
    (vec_id, centroid_id, arnk) — rank-1 rows for EVERY vector (the
    inverted lists) plus ranks 2.._N_PROBE for the query vectors only
    (the multi-probe rows), so the emitted row count is
    N + _N_QUERIES x (_N_PROBE - 1), not N x _N_PROBE.

    Same kernel shape and parity contract as
    similarity.ivf_inverted_lists: cosine dots as one chunked numpy
    matmul against the broadcast (k x dim) centroid matrix; rank key
    (rounded sim DESC, RAW sim DESC, centroid id ASC) via
    similarity._rank_centroids_desc, mirrored exactly by the oracle's
    assign CTE; zero-norm vectors/centroids rejected loudly (NaN sims
    rank differently across engines)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from _imdb_etl_spark.operators.similarity import (
        _CENTROID_FILTER,
        _N_CENTROIDS,
        _N_PROBE,
    )

    cent_rows = sorted(
        normed.where(F.expr(_CENTROID_FILTER))
        .orderBy("vec_id")
        .limit(_N_CENTROIDS)
        .collect(),
        key=lambda r: r.vec_id,
    )
    cmat = np.array([list(r.embedding) for r in cent_rows], dtype=np.float64)
    cnrm = np.array([r.nrm for r in cent_rows], dtype=np.float64)
    if not (cnrm > 0).all():
        raise ValueError(
            f"zero-norm centroid(s) "
            f"{[r.vec_id for r, n in zip(cent_rows, cnrm) if not n > 0]}"
            " — NaN sims rank differently across engines; clean the corpus"
        )
    cids = np.array([r.vec_id for r in cent_rows], dtype=np.int64)
    bc = normed.sparkSession.sparkContext.broadcast((cmat, cnrm, cids))

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("centroid_id", LongType()),
            StructField("arnk", IntegerType()),
        ]
    )
    n_queries, n_probe = _N_QUERIES, _N_PROBE
    chunk = _ENC_CHUNK

    def assign(batches):
        cm, cn, ci = bc.value
        for pdf in batches:
            for lo in range(0, len(pdf), chunk):
                sub = pdf.iloc[lo : lo + chunk]
                if sub.empty:
                    continue
                m = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
                nr = sub["nrm"].to_numpy(dtype=np.float64)
                if not (nr > 0).all():
                    bad = sub["vec_id"].to_numpy()[~(nr > 0)]
                    raise ValueError(
                        f"zero-norm vector(s) {bad[:5].tolist()} — NaN "
                        "sims rank differently across engines; clean "
                        "the corpus"
                    )
                raw = (m @ cm.T) / (nr[:, None] * cn[None, :])
                # inlined similarity._rank_centroids_desc (the pinned
                # rank-key contract): referencing the module function
                # from this closure would make the worker unpickle
                # import similarity standalone, which cycles through
                # plans/__init__ back into a partially-initialized
                # module. test_centroid_rank_raw_tiebreak pins the two
                # copies identical.
                key = np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5), raw) / 1e6
                order = np.lexsort((-raw, -key), axis=-1)
                vids = sub["vec_id"].to_numpy(dtype=np.int64)
                is_q = vids < n_queries
                p_eff = min(n_probe, order.shape[1])
                # rank-1 for everyone; ranks 2..p only for query rows
                parts = [
                    pd.DataFrame(
                        {
                            "vec_id": vids,
                            "centroid_id": ci[order[:, 0]],
                            "arnk": np.ones(len(vids), dtype=np.int32),
                        }
                    )
                ]
                if is_q.any() and p_eff > 1:
                    qv, qo = vids[is_q], order[is_q]
                    for r in range(1, p_eff):
                        parts.append(
                            pd.DataFrame(
                                {
                                    "vec_id": qv,
                                    "centroid_id": ci[qo[:, r]],
                                    "arnk": np.full(len(qv), r + 1, dtype=np.int32),
                                }
                            )
                        )
                yield pd.concat(parts, ignore_index=True)

    return normed.mapInPandas(assign, out_schema)


from _imdb_etl_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["sim_knn_ivfpq"] = _REG["sim_knn_ivfpq"].__class__(
    name="sim_knn_ivfpq",
    spark=_REG["sim_knn_ivfpq"].spark,
    oracle=_ivfpq_sql(),
    doc=_REG["sim_knn_ivfpq"].doc,
)


# --- IVF+PQ with exact re-rank: the two-stage serving pattern ---------

_REFINE_R = 20  # ADC shortlist size handed to the exact re-rank


def _ivfpq_refined_sql() -> str:
    return f"""{_ivfpq_scored_ctes()},
short AS (
  SELECT query_id, neighbor_id, approx_dot,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY approx_dot DESC, neighbor_id) AS pre_rank
  FROM scored
),
ref AS (
  SELECT s.query_id, s.neighbor_id, s.approx_dot,
         ROUND(({_DOT_SQL_FULL.format(a='nq.embedding', b='nn.embedding')})
               / (nq.nrm * nn.nrm), 6) AS exact_cos
  FROM short s
  JOIN n nq ON nq.vec_id = s.query_id
  JOIN n nn ON nn.vec_id = s.neighbor_id
  WHERE s.pre_rank <= {_REFINE_R}
)
SELECT query_id, neighbor_id, approx_dot, exact_cos, rnk AS neighbor_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY exact_cos DESC, neighbor_id) AS rnk
  FROM ref
)
WHERE rnk <= {_IVFPQ_TOP_K}
ORDER BY query_id, neighbor_rank
"""


@register(
    "sim_knn_ivfpq_refined",
    None,  # oracle installed below (composes the shared scored CTEs)
    doc=f"Two-stage ANN serving (coarse-then-refine, the production "
    "retrieval pattern FAISS calls refine/RFlat): the IVF+PQ ADC "
    f"stage shortlists the top-{_REFINE_R} candidates per query from "
    "16-byte codes, then ONLY the shortlist pays an exact-cosine "
    "re-rank against raw floats — per query the expensive float reads "
    f"drop from |probed lists| to {_REFINE_R} rows. Because the "
    "shortlist is a superset of the ADC top-k, the exact re-rank's "
    "recall provably dominates the ADC-only face (pinned in pytest). "
    "Composes the identical _ivfpq_scored stage as sim_knn_ivfpq — "
    "index semantics can't drift between the faces.",
)
def sim_knn_ivfpq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    scored = _ivfpq_scored(emb)
    pre_w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id")
    )
    short = scored.withColumn("pre_rank", F.row_number().over(pre_w)).where(
        F.col("pre_rank") <= _REFINE_R
    )
    normed = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot("embedding", "embedding")).alias("nrm"),
    )
    q = normed.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    nb = normed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("nrm").alias("nnrm"),
    )
    exact = F.round(
        _dot(F.col("qe"), F.col("ne")) / (F.col("qnrm") * F.col("nnrm")), 6
    )
    ref = (
        short.join(F.broadcast(q), "query_id")
        .join(nb, "neighbor_id")
        .select("query_id", "neighbor_id", "approx_dot", exact.alias("exact_cos"))
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("exact_cos"), F.asc("neighbor_id")
    )
    return (
        ref.withColumn("neighbor_rank", F.row_number().over(rank_w))
        .where(F.col("neighbor_rank") <= _IVFPQ_TOP_K)
        .orderBy("query_id", "neighbor_rank")
    )


_REG["sim_knn_ivfpq_refined"] = _REG["sim_knn_ivfpq_refined"].__class__(
    name="sim_knn_ivfpq_refined",
    spark=_REG["sim_knn_ivfpq_refined"].spark,
    oracle=_ivfpq_refined_sql(),
    doc=_REG["sim_knn_ivfpq_refined"].doc,
)


# --- top principal component: distributed covariance + local solve ---

_PCA_ITERS = 500  # driver-side power-iteration rounds on the dim x dim matrix

_PCA_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST({_DIM} AS BIGINT) AS dim,
       TRUE AS unit_norm,
       TRUE AS rayleigh_positive,
       TRUE AS rayleigh_dominates_mean
FROM embeddings
"""


@register(
    "embedding_pca_top_component",
    _PCA_SQL,
    doc="Top principal component, the Spark MLlib PCA shape: the "
    "covariance matrix is assembled DISTRIBUTED — one mapInPandas "
    "pass accumulating a per-partition (count, sum, X^T X) partial "
    "via numpy GEMM (the treeAggregate Gram pattern with BLAS inner "
    "loops; round 10 replaced the exploded per-row dim^2 cell form "
    "the 1000x probe measured at 14x per decade) — and only "
    "num_partitions dim^2 partials reach the driver, where the "
    "eigenvector is extracted by local power iteration (no LAPACK "
    "dependency in the distributed path). Correct at any corpus size "
    "for dim << corpus: cluster work is one scan, zero shuffles; "
    "driver work is O(partitions x dim^2) + O(dim^2) per power "
    "round. Driver-gated face is the invariant scorecard (unit "
    "norm, positive Rayleigh quotient, top eigenvalue >= trace/dim); "
    "the component itself is cross-checked against numpy eigh in "
    "pytest.",
)
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    vec, eigval, n, trace = _pca_top_component(spark, sf_dir)
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    unit = abs(math.sqrt(sum(x * x for x in vec)) - 1.0) < 1e-9
    return emb.agg(F.count(F.lit(1)).alias("n_vecs")).select(
        "n_vecs",
        F.lit(_DIM).cast("long").alias("dim"),
        F.lit(bool(unit)).alias("unit_norm"),
        F.lit(bool(eigval > 0)).alias("rayleigh_positive"),
        F.lit(bool(eigval >= trace / _DIM - 1e-12)).alias(
            "rayleigh_dominates_mean"
        ),
    )


def _pca_top_component(
    spark: SparkSession, sf_dir: str
) -> tuple[list[float], float, int, float]:
    """Distributed covariance assembly + local top-eigenpair extraction.
    Returns (component, top eigenvalue, n, trace). Exposed for pytest.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    (emb,) = load_tables(spark, sf_dir, "embeddings")
    x = spread(emb.select(F.col("embedding").cast("array<double>").alias("e")))
    # Gram assembly is one mapInPandas pass accumulating a PER-
    # PARTITION (count, sum vector, X^T X) partial via numpy GEMM —
    # the treeAggregate Gram pattern with BLAS inner loops. The
    # previous form exploded dim^2 = 4096 (i, j, x_i*x_j) structs per
    # ROW before the map-side partial agg collapsed them: linear in N
    # but with a 4096x row multiplier through the explode iterator —
    # the 1000x probe measured it at 255.8 s (14x per 10x data, vs
    # ~2x for its per-dim siblings); this form runs the same corpus
    # in one scan, no shuffle, and collects only num_partitions rows
    # of dim + dim^2 doubles (~33 KB each).
    part_schema = StructType(
        [
            StructField("cnt", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("g", ArrayType(DoubleType())),
        ]
    )

    def gram_partials(batches):
        cnt = 0
        s = np.zeros(_DIM)
        g = np.zeros((_DIM, _DIM))
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["e"].to_numpy())
            cnt += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        if cnt:
            yield pd.DataFrame(
                {"cnt": [cnt], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    parts = x.mapInPandas(gram_partials, part_schema).collect()
    n = int(sum(r.cnt for r in parts))
    s_tot = np.zeros(_DIM)
    g_tot = np.zeros((_DIM, _DIM))
    for r in parts:
        s_tot += np.asarray(r.s)
        g_tot += np.asarray(r.g).reshape(_DIM, _DIM)
    mu = (s_tot / n).tolist()
    cov_np = g_tot / n - np.outer(s_tot / n, s_tot / n)
    cov = cov_np.tolist()
    trace = sum(cov[i][i] for i in range(_DIM))
    # local power iteration on the dim x dim matrix (pure python; no
    # cluster rounds — the corpus is touched exactly once above, the
    # single mapInPandas Gram-partial pass)
    v = [1.0 / math.sqrt(_DIM)] * _DIM
    eigval = 0.0
    for _ in range(_PCA_ITERS):
        w = [sum(cov[i][j] * v[j] for j in range(_DIM)) for i in range(_DIM)]
        nrm = math.sqrt(sum(c * c for c in w))
        eigval = nrm
        v = [c / nrm for c in w]
    return v, eigval, n, trace


# --- diagonal-Mahalanobis embedding outliers ---------------------------
#
# Embedding-quality audit: vectors far from the corpus distribution
# under a per-dimension variance scaling (diagonal Mahalanobis) —
# catches collapsed/corrupted embeddings that plain L2-to-centroid
# misses when dimensions have very different spreads. Per-dim moments
# follow the centroid-cohesion policy (accumulate f64, ROUND(6) at
# the boundary before reuse), the 64-term score folds in fixed j
# order, and the one broadcast is the 2x64 moment table.

_MAHA_TOP = 20

_MAHA_SQL = f"""
WITH comp AS (
  SELECT j, ROUND(AVG(CAST(embedding[j] AS DOUBLE)), 6) AS mu,
         ROUND(VAR_SAMP(CAST(embedding[j] AS DOUBLE)), 6) AS v
  FROM embeddings, range(1, {_DIM} + 1) t(j)
  GROUP BY j
),
moments AS (
  SELECT list(mu ORDER BY j) AS mus, list(v ORDER BY j) AS vars FROM comp
),
scored AS (
  SELECT e.vec_id, e.label,
         ROUND(list_sum(list_transform(range(1, {_DIM} + 1),
               j -> (CAST(e.embedding[j] AS DOUBLE) - m.mus[j])
                    * (CAST(e.embedding[j] AS DOUBLE) - m.mus[j])
                    / m.vars[j])), 6) AS maha_sq
  FROM embeddings e, moments m
)
SELECT vec_id, CAST(label AS BIGINT) AS label, maha_sq
FROM scored
ORDER BY maha_sq DESC, vec_id
LIMIT {_MAHA_TOP}
"""


@register(
    "embedding_outlier_mahalanobis",
    _MAHA_SQL,
    doc=f"Top-{_MAHA_TOP} embedding outliers by diagonal Mahalanobis "
    "distance: per-dim mean/variance (f64 accumulate, round-at-"
    "boundary), one 2x64 broadcast, fixed-order 64-term fold per "
    "vector — corpus-linear with a constant-size model, the "
    "distribution-aware sibling of L2-to-centroid screening.",
)
def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    comp = (
        emb.select(
            F.posexplode("embedding").alias("j0", "x")
        )
        .groupBy((F.col("j0") + 1).alias("j"))
        .agg(
            F.round(F.avg(F.col("x").cast("double")), 6).alias("mu"),
            F.round(F.var_samp(F.col("x").cast("double")), 6).alias("v"),
        )
    )
    moments = comp.agg(
        F.array_sort(
            F.collect_list(F.struct("j", "mu"))
        ).alias("mu_s"),
        F.array_sort(
            F.collect_list(F.struct("j", "v"))
        ).alias("v_s"),
    ).select(
        F.col("mu_s.mu").alias("mus"), F.col("v_s.v").alias("vars")
    )
    scored = emb.crossJoin(F.broadcast(moments)).select(  # 1-row moment table
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.lit(_DIM)),
                    lambda j: (
                        F.element_at("embedding", j).cast("double")
                        - F.element_at("mus", j)
                    )
                    * (
                        F.element_at("embedding", j).cast("double")
                        - F.element_at("mus", j)
                    )
                    / F.element_at("vars", j),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("maha_sq"),
    )
    return scored.orderBy(F.desc("maha_sq"), "vec_id").limit(_MAHA_TOP)
