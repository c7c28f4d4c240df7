"""Approximate-nearest-neighbor search over embedding columns.

* brute-force cosine top-k — the exactness baseline, pure Column algebra
  (``zip_with`` dot product inside whole-stage codegen), DuckDB oracle
  via ``list_cosine_similarity``.
* LSH-bucketed ANN (random hyperplanes, deterministic planes derived
  from md5 so both engines — and reruns — agree): probe only the query's
  bucket ring. At cluster scale the bucket id is the shuffle/partition
  key, so a query touches one partition instead of the full corpus.
* IVF-style variant: coarse centroids from a deterministic sample,
  assign by nearest centroid, probe nearest ``nprobe`` lists.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def _norm(x):
    return F.sqrt(_dot(x, x))


def cosine(x, y):
    return _dot(x, y) / (_norm(x) * _norm(y))


def brute_force_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. One scan + one top-k (TakeOrdered — no full
    sort)."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = emb.select(
        F.col(id_col).alias("vec_id"), F.round(cosine(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: component j is
    md5("p:{plane}:{j}") mapped to [-1, 1). Portable to SQL."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"p:{plane}:{j}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 2**31) - 1.0)
    return out


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Bit b of the bucket = sign of <vec, plane_b>."""
    bucket = F.lit(0)
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(_dot(vec_col, p) >= 0, F.lit(2 ** b)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN: score only vectors whose hyperplane bucket is within
    ``multiprobe_hamming`` bits of the query's bucket."""
    dim = len(query)
    planes = [hyperplane(b, dim) for b in range(n_planes)]
    bucketed = emb.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))

    qbits = 0
    for b, plane in enumerate(planes):
        if sum(q * p for q, p in zip(query, plane)) >= 0:
            qbits += 2 ** b
    probe = [
        bb
        for bb in range(2 ** n_planes)
        if bin(bb ^ qbits).count("1") <= multiprobe_hamming
    ]

    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        bucketed.filter(F.col("_bucket").isin(probe))
        .select(F.col(id_col).alias("vec_id"), F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def lsh_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-dup pairs via LSH blocking — the scale path the
    blocked brute force in ``dedup.embedding_near_dup`` documents.

    ``n_tables`` independent hyperplane sets (planes t*n_planes..): a
    pair is a candidate if it shares a bucket in ANY table (multi-table
    recall boosting — for vectors at angle θ, each table catches the
    pair with prob (1-θ/π)^n_planes, so tables union toward 1). The
    bucket is the shuffle key — pair space is per-bucket, never global.
    Candidates are verified with exact cosine ≥ threshold; deterministic
    md5-derived planes make the result reproducible and SQL-mirrorable
    (hash-exact DuckDB oracle in __spark_entry__)."""
    cands = None
    for t in range(n_tables):
        planes = [hyperplane(t * n_planes + b, dim) for b in range(n_planes)]
        bucketed = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            lsh_bucket_col(F.col(vec_col), planes).alias("_bucket"),
        )
        a, b = bucketed.alias("a"), bucketed.alias("b")
        pairs_t = (
            a.join(b, F.col("a._bucket") == F.col("b._bucket"))
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        cands = pairs_t if cands is None else cands.unionByName(pairs_t)
    cands = cands.distinct()

    # norms are per-VECTOR: compute once before the pair join so each
    # candidate pair costs one dot-product aggregate, not three (the
    # higher-order aggregate is interpreted — measured 3x the verify
    # cost when norms rode the pair side). NOTE: a 64-term unrolled
    # element_at chain is NOT the fix — it blew past the codegen/JIT
    # method budget and ran 3.6x slower than the HOF aggregate.
    normed = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("nrm")
    )
    va = normed.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = normed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_assign(
    emb: DataFrame,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse quantizer: centroids = the vectors whose id ≡ i mod
    stride (deterministic sample — a real system would k-means); assign
    every vector to its nearest centroid list."""
    cents = [
        (i, [float(x) for x in r[vec_col]])
        for i, r in enumerate(
            emb.orderBy(id_col).limit(n_lists).collect()
        )
    ]
    # argmax over a FLAT array of (cos, -i) structs: one array_max, depth
    # O(1) in the Catalyst tree — the nested when/otherwise chain this
    # replaces grew the expression tree O(n_lists) deep and blew up
    # analysis at real IVF list counts (1024+). The centroid collect is
    # inherently driver-side and tiny (n_lists rows).
    scored = F.array(
        *[
            F.struct(
                cosine(F.col(vec_col), F.array(*[F.lit(v) for v in c])).alias("cos"),
                F.lit(-i).alias("neg_i"),
            )
            for i, c in cents
        ]
    )
    best = F.array_max(scored)  # struct compare: max cos, ties -> smallest i
    return emb.withColumn("ivf_list", (-best["neg_i"]).cast("int")), cents


def ivf_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_lists: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    assigned, cents = ivf_assign(emb, n_lists, id_col, vec_col)
    qnorm = math.sqrt(sum(v * v for v in query))
    scored = sorted(
        (
            (
                i,
                sum(q * c for q, c in zip(query, cv))
                / (qnorm * math.sqrt(sum(c * c for c in cv)) + 1e-12),
            )
            for i, cv in cents
        ),
        key=lambda t: -t[1],
    )
    probe = [i for i, _ in scored[:nprobe]]
    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        assigned.filter(F.col("ivf_list").isin(probe))
        .select(F.col(id_col).alias("vec_id"), F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
