"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM ``F.aggregate`` /
``zip_with`` dot products — no Python); an LSH-bucketed variant is the
scale path: random-hyperplane signatures shrink the candidate set from
|corpus| to one bucket before exact re-scoring.

Design rules mirroring the dedup module:
* arithmetic in **double** end-to-end (embeddings cast once), rounded at
  the output edge to 6 dp so IEEE-identical engines (DuckDB oracle)
  compare exactly;
* hyperplanes are **deterministic** — components derived from md5 of
  (plane, dim) — no RNG, reproducible at any scale;
* top-k is tie-broken by vec_id: fully deterministic output.

Scale: brute force is a broadcast of the query vector over a linear scan —
embarrassingly parallel, no shuffle; right answer up to ~10^9×small-k.
LSH reduces scanned candidates by ~2^n_planes for ANN workloads; IVF
(k-means buckets) slots into the same bucket-join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the corpus vector ``query_vec_id``
    (excluded from results). The query vector is a one-row broadcast; the
    corpus side never shuffles."""
    emb = embeddings.select(
        "vec_id", _as_double(F.col(vec_col)).alias("v")
    )
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("q")
    )
    scored = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_dot(F.col("v"), F.col("q")) / (_norm(F.col("v")) * _norm(F.col("q"))), 6).alias(
                "cosine"
            ),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def _hyperplane(plane: int, dim: int, table: int = 0) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d ∈ {-1,+1} from
    md5(table|plane|d) parity — fixed for all time, engine-independent."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{table}|{plane}|{d}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) >= 8 else -1.0)
    return out


def rh_signature_col(vec, n_planes: int, dim: int, table: int = 0):
    """Random-hyperplane LSH signature: bit p = sign(v · h_p)."""
    bits = []
    for p in range(n_planes):
        hp = F.array(*[F.lit(c) for c in _hyperplane(p, dim, table)])
        bits.append(F.when(_dot(vec, hp) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    n_tables: int = 12,
) -> DataFrame:
    """ANN: score only vectors whose hyperplane signature matches the
    query's in at least one of ``n_tables`` independent hash tables
    (standard multi-table LSH: per-table candidate fraction ≈ 2^-n_planes,
    union across tables recovers recall; recall pinned by
    tests/test_similarity.py). Approximate — driver records the rows-only
    check for this one."""
    emb = embeddings.select("vec_id", _as_double(F.col(vec_col)).alias("v"))
    sigs = emb.select(
        "vec_id",
        "v",
        *[
            rh_signature_col(F.col("v"), n_planes, dim, table=t).alias(f"sig{t}")
            for t in range(n_tables)
        ],
    )
    q = sigs.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("q"),
        *[F.col(f"sig{t}").alias(f"qsig{t}") for t in range(n_tables)],
    )
    match_any = None
    for t in range(n_tables):
        m = F.col(f"sig{t}") == F.col(f"qsig{t}")
        match_any = m if match_any is None else (match_any | m)
    cands = (
        sigs.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .filter(match_any)
    )
    return (
        cands.select(
            "vec_id",
            F.round(
                _dot(F.col("v"), F.col("q")) / (_norm(F.col("v")) * _norm(F.col("q"))), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def pairwise_label_centroids(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label centroid norms (IVF building block): mean vector per label
    via element-wise array aggregation, reported as rounded L2 norm +
    count. Shows the posexplode→agg→collect pattern that scales to IVF
    coarse quantizers."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "label", F.posexplode(_as_double(F.col("embedding"))).alias("dim", "x")
    )
    cent = emb.groupBy("label", "dim").agg(
        F.avg("x").alias("mean_x"), F.count("*").alias("n")
    )
    return (
        cent.groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("mean_x") * F.col("mean_x"))), 6).alias("centroid_norm"),
            F.max("n").alias("n_vectors"),
        )
    )
