"""Synthetic scale-up of the driver's parquet tables (sf0.1 -> ~sf1).

The test environment ships sf0.001/0.01/0.1 only, but the engine's
claims are about 100 TB behavior — one order of magnitude of measured
headroom beats extrapolation. ``ensure_scaled`` materializes a
``factor``x copy of a source sf directory by replicating every row
``factor`` times with consistent key remapping, preserving the
relational structure instead of naively concatenating rows:

- every key/foreign-key column maps ``key * factor + replica``, so each
  replica is a disjoint, internally-consistent copy of the whole join
  graph (orders still find their customers, lineitems their orders) and
  per-key fan-outs / group sizes stay exactly what they were at the
  source sf — join selectivity and skew shape are preserved;
- ``nation`` / ``region`` are copied unreplicated (fixed dimensions do
  not grow with scale factor, exactly as in TPC-H);
- ``documents.text`` tokens are salted with the replica id (and
  ``n_chars`` recomputed): un-salted replicas would make every document
  a 10-way exact duplicate, exploding dedup candidate groups
  quadratically; salting keeps the duplicate RATE identical to the
  source corpus while the corpus grows linearly — the honest dedup
  scale-up;
- ``embeddings.embedding`` gets the same treatment in vector space
  (round 9, after the 1000x probe OOM'd the GEMM-IVF face): each
  replica's vector is multiplied element-wise by a deterministic
  Rademacher +-1 pattern derived from (replica, dim index). Cosine
  WITHIN a replica is exactly preserved (a fixed sign flip is an
  isometry), so the original near-dup cluster structure replicates;
  ACROSS replicas two independent sign patterns make expected cosine
  ~0, so replicas are not near-duplicates of each other — without
  this, 1000 identical copies of every vector made the true pair
  relation itself quadratic (C(1000,2) x corpus ~ 3.2e9 pairs at
  1000x) and deterministic tie-breaks funneled all replicas into the
  same few inverted lists (a 43k-row list means a 15 GB per-group
  GEMM: the OOM);
- ``events`` timestamps keep their values (10x the users emit in the
  same window -> 10x rows per hour bucket), and sessionization still
  sees each replicated user's original event sequence.

Output layout mirrors the testdata (``<table>.parquet`` paths readable
by sources/catalog.py); big tables are written with enough files for
parallel scans. Generation is idempotent: a ``_DONE`` marker skips
re-generation on every later run.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _imdb_etl_spark.sources.catalog import DRIVER_TABLES, table

# key columns remapped to key * factor + replica (foreign keys included,
# with the same formula, so intra-replica joins stay consistent)
_KEYS = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "nation": None,  # fixed dims: copy once, unreplicated
    "region": None,
}

# output files per table: enough splits that a local[32] scan (and the
# spread() heuristic) sees real parallelism on the big tables
_OUT_FILES = {
    "lineitem": 32,
    "orders": 16,
    "events": 16,
    "part": 8,
    "documents": 8,
    "embeddings": 8,
    "customer": 4,
    "supplier": 4,
}


def _replicate(df: DataFrame, name: str, factor: int) -> DataFrame:
    keys = _KEYS.get(name)
    if keys is None:
        return df
    cols = df.columns
    rep = df.withColumn(
        "_r", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = rep.select(
        *[
            (F.col(c) * factor + F.col("_r")).alias(c) if c in keys else F.col(c)
            for c in cols
        ],
        "_r",
    )
    if name == "embeddings":
        # Rademacher sign flip per (replica, dim): isometric within a
        # replica (near-dup structure preserved exactly), ~orthogonal
        # across replicas (see module docstring). replica 0 keeps the
        # source vectors bit-for-bit (sign +1), so factor=1 is identity.
        elem = df.schema["embedding"].dataType.elementType.simpleString()
        sign = (
            "CASE WHEN _r = 0 THEN CAST(1.0 AS {t}) "
            "WHEN pmod(xxhash64(_r, i), 2) = 0 THEN CAST(1.0 AS {t}) "
            "ELSE CAST(-1.0 AS {t}) END"
        ).format(t=elem)
        out = out.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> x * ({sign}))"
            ),
        )
    if name == "documents":
        # salt every token with the replica id so replicas are not
        # near-duplicates of each other (see module docstring)
        salted = F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t: F.concat(t, F.lit("_"), F.col("_r").cast("string")),
            ),
            " ",
        )
        out = out.withColumn("text", salted).withColumn(
            "n_chars", F.length("text").cast("long")
        )
    return out.drop("_r")


def _marker_text(src_dir: str, factor: int) -> str:
    """Generation fingerprint: factor + source path + source file
    sizes. If the source testdata drifts between rounds (it has
    before) or a different factor is requested, the marker no longer
    matches and the data regenerates instead of being silently reused
    at the wrong scale."""
    sizes = []
    for name in DRIVER_TABLES:
        p = os.path.join(src_dir, f"{name}.parquet")
        try:
            sizes.append(f"{name}:{os.stat(p).st_size}")
        except OSError:
            sizes.append(f"{name}:absent")
    # gen bumps when the replication TRANSFORM changes (not just the
    # source): gen=2 added the embedding Rademacher salt, and data
    # generated before it must not pass the marker check.
    return f"gen=2 factor={factor} src={src_dir} {' '.join(sizes)}\n"


def ensure_scaled(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> float | None:
    """Materialize a ``factor``x scaled copy of ``src_dir`` into
    ``dst_dir`` unless a matching copy is already present. Returns
    generation seconds, or None when the marker proves the existing
    data was built from this exact source at this factor.

    Concurrency: generation happens in a pid-suffixed sibling
    directory that is renamed into place only when complete, so a
    second process racing past the marker check either loses the
    rename (and discards its copy) or sees the winner's marker — no
    process ever reads a half-written table."""
    import shutil

    marker = os.path.join(dst_dir, "_DONE")
    want = _marker_text(src_dir, factor)
    try:
        with open(marker) as f:
            if f.read() == want:
                return None
    except OSError:
        pass
    t0 = time.time()
    tmp = f"{dst_dir}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for name in DRIVER_TABLES:
        src = table(spark, src_dir, name)
        n_files = _OUT_FILES.get(name)
        if n_files and factor >= 100 and _KEYS.get(name) is not None:
            # spread the SOURCE before the fan-out, not the fan-out's
            # output: each sf0.1 table is one parquet file, so the
            # factor-x explode (the expensive part — hundreds of
            # millions of rows at 1000x) would otherwise run as ONE
            # task while 31 cores idle (measured: the 1000x orders
            # generation sat single-threaded for half an hour). A
            # round-robin of the small source is cheap, the explode
            # then runs map-side at machine width, and the output
            # needs NO post-explode repartition — which at 1000x was
            # itself a full shuffle of the replicated table.
            src = src.repartition(max(n_files, os.cpu_count() or 8))
            df = _replicate(src, name, factor)
        else:
            df = _replicate(src, name, factor)
            if n_files:
                df = df.repartition(n_files)
        df.write.mode("overwrite").parquet(os.path.join(tmp, f"{name}.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(want)
    # replace any stale copy, then move the finished dir into place;
    # if a concurrent generator won the race, keep theirs
    shutil.rmtree(dst_dir, ignore_errors=True)
    try:
        os.rename(tmp, dst_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return time.time() - t0
