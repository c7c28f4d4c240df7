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


def planes_for_corpus(n_vectors: int, target_bucket_size: int = 256, min_planes: int = 4) -> int:
    """Plane count scaled to the corpus: n_planes ≈ log2(N / target).

    A FIXED plane count saturates — 4 planes is 16 buckets for the whole
    corpus, so per-bucket pair space is O((N/16)²) and the self-join goes
    quadratic at 10⁹ vectors. Growing planes with log2(N) keeps the
    expected bucket occupancy ≈ target_bucket_size at any corpus size
    (10⁹ vectors / target 256 ⇒ 22 planes ⇒ 4M buckets)."""
    if n_vectors <= 0:
        return min_planes
    return max(min_planes, math.ceil(math.log2(max(n_vectors / target_bucket_size, 1.0))))


def bucket_rows_for_corpus(
    n_rows: int,
    n_bucket_space: int | None = None,
    skew_factor: int = 32,
    floor: int = 4096,
    ceiling: int = 65_536,
) -> int:
    """Default saturation threshold for a banding/bucket join, the
    ``planes_for_corpus`` twin for guards: ``skew_factor`` × the expected
    uniform occupancy (``n_rows / n_bucket_space``), clamped to
    [floor, ceiling].

    * ``floor`` keeps small corpora from tripping on ordinary duplicate
      families and toy-scale skew (a 4096-row bucket is ~8M pairs —
      one task's work; measured: sf0.1's 5k docs put 1338 rows in the
      hottest 32-bit band bucket, 68× the mean but trivially cheap);
    * ``ceiling`` is the absolute per-bucket cost bound: a 65k-row bucket
      is ~2·10⁹ candidate pairs, the most any single shuffle key should
      ever own — and it's exactly how UNDER-PARAMETERIZED schemes fail
      (32-bit simhash at 10⁸ docs has a 390k-row *expected* bucket:
      scaling the threshold with that expectation would bless the
      saturation the guard exists to catch).
    * ``n_bucket_space=None`` means the bucket key is a full-width hash
      (minhash md5 bands): expected occupancy ≈ 1, so the floor governs.

    A legitimately mega-duplicated corpus (one family > threshold) also
    raises — by design: that family's pair space IS quadratic, and the
    standard pipeline order (exact_dedup first) removes it before any
    banding join."""
    mean = 1.0 if n_bucket_space is None else n_rows / max(1, n_bucket_space)
    return max(floor, min(ceiling, int(skew_factor * max(1.0, mean))))


def check_bucket_load(
    bucketed: DataFrame,
    bucket_col: str = "_bucket",
    max_bucket_rows: int | str | None = None,
    n_bucket_space: int | None = None,
) -> int:
    """Loud saturation guard: returns the largest bucket's row count and
    raises if it exceeds ``max_bucket_rows``. A silently-saturated bucket
    is the failure mode of every fixed-parameter LSH — per-bucket pair
    space is rows², so a 4M-row bucket is 16·10¹² pairs. One cheap
    count-agg job over the bucket keys (never the vectors).

    ``max_bucket_rows='auto'`` derives the threshold from the SAME
    single agg (no extra job): :func:`bucket_rows_for_corpus` over the
    table's total rows and the scheme's theoretical bucket space
    (``n_bucket_space`` — the caller's band×block-value count; None for
    full-width hash buckets). The observed bucket count is deliberately
    NOT used: a saturated banding collapses to few observed buckets,
    which would scale the threshold up right when it must fire."""
    row = (
        bucketed.groupBy(bucket_col)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("total"))
        .first()
    )
    mx, total = int(row.mx or 0), int(row.total or 0)
    if max_bucket_rows == "auto":
        max_bucket_rows = bucket_rows_for_corpus(total, n_bucket_space)
    if max_bucket_rows is not None and mx > max_bucket_rows:
        raise RuntimeError(
            f"LSH bucket saturation: largest bucket holds {mx} rows "
            f"(> {max_bucket_rows}); raise n_planes/bits (see "
            f"planes_for_corpus) or exact-dedup the mega-family first"
        )
    return mx


def lsh_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN: score only vectors whose hyperplane bucket is within
    ``multiprobe_hamming`` bits of the query's bucket.

    ``n_planes=None`` derives the plane count from a corpus count
    (:func:`planes_for_corpus`) so buckets keep ~constant occupancy as
    the corpus grows; pass an explicit value to pin reproducible buckets
    (the oracle-checked contract queries do)."""
    dim = len(query)
    if n_planes is None:
        n_planes = planes_for_corpus(emb.count())
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
    n_planes: int | None = 4,
    n_tables: int = 2,
    threshold: float = 0.95,
    max_bucket_rows: int | str | None = "auto",
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
    (hash-exact DuckDB oracle in __spark_entry__).

    ``n_planes=None`` derives the plane count from the corpus size
    (:func:`planes_for_corpus`) — a fixed count saturates as N grows.
    ``max_bucket_rows`` is the loud per-table saturation guard
    (:func:`check_bucket_load`); the default ``'auto'`` derives its
    threshold from the corpus and the ``n_tables × 2^n_planes`` bucket
    space (None disables — opt-out, not the default)."""
    if n_planes is None:
        n_planes = planes_for_corpus(emb.count())
    # ALL tables' buckets from ONE corpus scan (struct array + explode),
    # candidates from ONE self-join keyed (table, bucket) — the same
    # shape as minhash banding. The previous per-table loop scanned the
    # corpus and shuffled once PER table; the pair set is identical
    # (union-of-per-table-joins == join-on-(t,bucket), both distinct'd).
    table_buckets = []
    for t in range(n_tables):
        planes = [hyperplane(t * n_planes + b, dim) for b in range(n_planes)]
        table_buckets.append(
            F.struct(F.lit(t).alias("t"), lsh_bucket_col(F.col(vec_col), planes).alias("bkt"))
        )
    buckets = emb.select(
        F.col(id_col).alias("id"), F.explode(F.array(*table_buckets)).alias("b")
    ).select("id", "b.t", "b.bkt")
    if max_bucket_rows is not None:
        # the bucket column costs n_planes HOF dot-products per row —
        # persist the (id, t, bkt) projection so the guard's agg and the
        # self-join's two sides all read one computation (the projection
        # is three scalars/row; eviction under pressure just recomputes)
        buckets = buckets.persist()
        check_bucket_load(
            buckets.select(F.concat_ws(":", "t", "bkt").alias("_bucket")),
            "_bucket",
            max_bucket_rows,
            n_bucket_space=n_tables * (1 << min(n_planes, 40)),
        )
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.bkt") == F.col("b.bkt")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

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


def kmeans_centroids(
    emb: DataFrame,
    n_lists: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    n_iter: int = 10,
) -> list[tuple[int, list[float]]]:
    """Coarse-quantizer centroids: Lloyd's k-means on a deterministic
    sample, driver-side numpy.

    Driver-side is the right altitude here — IVF list counts are small
    (n_lists ≤ 4096 documented bound; the sample is ≤ sample_size rows,
    a few MB) while the ASSIGNMENT below stays distributed. Determinism
    WITHOUT bias: the sample is a hash-mod slice —
    ``pmod(xxhash64(id), m) == 0`` with m sized so the expected hit
    count ≈ sample_size — not takeSample's RNG (unreproducible) and not
    first-N-by-id (id order often correlates with content, so a prefix
    sample sees only the first natural clusters and farthest-point
    seeding can't recover what the sample never contains;
    tests/test_similarity.py pins the recall gap on a clustered
    fixture). Same input ⇒ same hash hits ⇒ same centroids; seeding is
    greedy farthest-point from the lowest-id sampled row, ties break to
    the lowest centroid index."""
    import numpy as np

    if n_lists > 4096:
        raise ValueError(f"n_lists={n_lists} exceeds the driver-side k-means bound (4096)")
    n_rows = emb.count()
    target = max(sample_size, n_lists)
    m = max(1, n_rows // target)
    sampled = emb.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
    # hard cap keeps the driver transfer bounded even when the hash-mod
    # estimate overshoots; ordering by id makes the cap deterministic
    rows = sampled.orderBy(id_col).limit(target).select(vec_col).collect()
    if len(rows) < n_lists:  # tiny corpus or unlucky modulus: widen
        rows = emb.orderBy(id_col).limit(target).select(vec_col).collect()
    X = np.array([[float(v) for v in r[0]] for r in rows], dtype=np.float64)
    # cosine k-means: operate on the unit sphere (spherical k-means)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Xu = X / norms
    # greedy k-center init: next seed = the sample point least similar to
    # its nearest already-chosen seed (argmin ties -> lowest row index)
    seed_idx = [0]
    best_sim = Xu @ Xu[0]
    for _ in range(1, n_lists):
        nxt = int(np.argmin(best_sim))
        seed_idx.append(nxt)
        best_sim = np.maximum(best_sim, Xu @ Xu[nxt])
    C = Xu[seed_idx].copy()
    for _ in range(n_iter):
        sims = Xu @ C.T  # (n, k) cosine since both sides unit-norm
        assign = np.argmax(sims, axis=1)  # np.argmax ties -> lowest index
        newC = np.zeros_like(C)
        for j in range(n_lists):
            members = Xu[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                newC[j] = m / n if n > 0 else C[j]
            else:  # empty list keeps its seed — deterministic, no resample
                newC[j] = C[j]
        if np.allclose(newC, C):
            break
        C = newC
    return [(i, [float(x) for x in C[i]]) for i in range(n_lists)]


def ivf_assign(
    emb: DataFrame,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse quantizer: spherical-k-means centroids from a
    deterministic sample (:func:`kmeans_centroids`); assign every vector
    to its nearest centroid list."""
    cents = centroids if centroids is not None else kmeans_centroids(
        emb, n_lists, vec_col=vec_col, id_col=id_col
    )
    # argmax over a FLAT array of (cos, -i) structs: one array_max, depth
    # O(1) in the Catalyst tree — the nested when/otherwise chain this
    # replaces grew the expression tree O(n_lists) deep and blew up
    # analysis at real IVF list counts (1024+). The centroid collect is
    # inherently driver-side and tiny (n_lists rows). Degenerate-cosine
    # guard: a zero-norm row or centroid makes the division 0/0 — a
    # DIVIDE_BY_ZERO error under ANSI mode, NaN otherwise, and struct
    # ordering sorts NaN ABOVE every double, so an unguarded degenerate
    # centroid would capture the whole corpus. try_divide + nanvl +
    # coalesce pins both regimes to a score of -2.0 (below any cosine).
    def _centroid_score(c):
        carr = F.array(*[F.lit(float(v)) for v in c])
        cnorm = math.sqrt(sum(float(v) * float(v) for v in c))
        td = F.try_divide(_dot(F.col(vec_col), carr), _norm(F.col(vec_col)) * F.lit(cnorm))
        # round-6 before argmax: makes the assignment portable to the SQL
        # oracle (round(list_cosine_similarity)) — same discipline as the
        # cosine contract queries
        return F.coalesce(F.nanvl(F.round(td, 6), F.lit(-2.0)), F.lit(-2.0))

    scored = F.array(
        *[
            F.struct(_centroid_score(c).alias("cos"), F.lit(-i).alias("neg_i"))
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
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    assigned, cents = ivf_assign(emb, n_lists, id_col, vec_col, centroids=centroids)
    qnorm = math.sqrt(sum(v * v for v in query))
    scored = sorted(
        (
            (
                i,
                round(
                    sum(q * c for q, c in zip(query, cv))
                    / (qnorm * math.sqrt(sum(c * c for c in cv)) + 1e-12),
                    6,
                ),
            )
            for i, cv in cents
        ),
        key=lambda t: (-t[1], t[0]),  # ties -> lowest list id (portable)
    )
    probe = [i for i, _ in scored[:nprobe]]
    q = F.array(*[F.lit(float(v)) for v in query])
    return (
        assigned.filter(F.col("ivf_list").isin(probe))
        .select(F.col(id_col).alias("vec_id"), F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
