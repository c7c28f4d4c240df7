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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def _norm(x):
    return F.sqrt(_dot(x, x))


def cosine(x, y):
    return _dot(x, y) / (_norm(x) * _norm(y))


# --------------------------------------------------------------------------
# Arrow-vectorized kernels (round 6).
#
# The Column forms above run in Catalyst's INTERPRETED higher-order-
# function path: every `aggregate(zip_with(...))` walks the 64-element
# arrays one boxed element at a time, per row (or per candidate pair).
# Profiled at the 20k-vector large world, that interpretation was the
# whole cost of lsh_near_dup_pairs (~30 s wall; the plan itself — one
# scan, one (t,bucket) self-join — was already right). The kernels below
# hand whole Arrow batches to numpy instead (optimization guide §4.2).
#
# BIT-EXACTNESS CONTRACT: Catalyst's fold is strictly left-to-right —
# acc = ((0.0 + x0*y0) + x1*y1) + ... — and floating-point addition is
# not associative, so a numpy `np.dot` (pairwise/SIMD summation) could
# flip a rounded 6th decimal and break the hash-exact DuckDB oracles.
# Every kernel therefore accumulates with an explicit per-dimension
# loop, vectorized ACROSS rows: `acc += V[:, j] * W[j]` performs, for
# every row, exactly the same IEEE-754 multiply-add sequence as the
# Column fold. Final round(6)/compares stay in Column land (Spark's
# HALF_UP round is not numpy's banker's round). Equality is pinned by
# tests/test_similarity.py and the oracle gate.
# --------------------------------------------------------------------------


def _stack(series):
    """pandas Series of float arrays -> (n, d) float64 matrix."""
    if len(series) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack(series.to_numpy())


def _foldl_rows_dot(A, B):
    """Per-row fold-left dot of two (n, d) matrices — Catalyst order."""
    acc = np.zeros(len(A), dtype=np.float64)
    for j in range(A.shape[1]):
        acc += A[:, j] * B[:, j]
    return acc


def pair_dot_udf():
    """pandas_udf: fold-left <a, b> per row over two array<double> cols."""

    @F.pandas_udf("double")
    def dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(_foldl_rows_dot(_stack(a), _stack(b)))

    return dot


def vec_norm_udf():
    """pandas_udf: fold-left sqrt(<v, v>) per row."""

    @F.pandas_udf("double")
    def nrm(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        V = _stack(v)
        return pd.Series(np.sqrt(_foldl_rows_dot(V, V)))

    return nrm


def _foldl_qnorm(q: list[float]) -> float:
    """Fold-left ||q|| for a driver-side query vector — same IEEE
    sequence as the Column `_norm` over an array of literals."""
    acc = 0.0
    for x in q:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def cosine_to_query_udf(query: list[float]):
    """pandas_udf: fold-left cosine(v, query) — replaces the interpreted
    per-row `cosine(col, array_of_lits)` Column expression."""
    q = [float(x) for x in query]
    qnorm = _foldl_qnorm(q)
    qarr = np.array(q, dtype=np.float64)

    @F.pandas_udf("double")
    def cosq(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        V = _stack(v)
        acc = np.zeros(len(V), dtype=np.float64)
        nacc = np.zeros(len(V), dtype=np.float64)
        for j in range(V.shape[1]):
            acc += V[:, j] * qarr[j]
            nacc += V[:, j] * V[:, j]
        return pd.Series(acc / (np.sqrt(nacc) * qnorm))

    return cosq


def plane_buckets_udf(planes_flat: list[list[float]], n_planes: int, n_tables: int):
    """pandas_udf: all ``n_tables`` LSH bucket ids of a vector in ONE
    Arrow pass — table t's bucket bit b is sign(<v, plane[t*n_planes+b]>),
    fold-left, identical to ``lsh_bucket_col`` per plane."""
    P = np.array(planes_flat, dtype=np.float64)  # (n_tables*n_planes, d)
    weights = (2 ** np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def bkts(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        V = _stack(v)
        acc = np.zeros((len(V), P.shape[0]), dtype=np.float64)
        for j in range(V.shape[1]):
            acc += V[:, j : j + 1] * P[:, j]
        bits = acc >= 0.0
        out = (bits.reshape(len(V), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series(list(out.astype(np.int32)))

    return bkts


def brute_force_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. One scan + one top-k (TakeOrdered — no full
    sort). Scoring is the Arrow-vectorized fold-left kernel (round 6:
    the interpreted per-row HOF cosine was the whole stage cost); the
    round(6) stays in Column land for oracle parity."""
    cosq = cosine_to_query_udf(query)
    scored = emb.select(
        F.col(id_col).alias("vec_id"), F.round(cosq(F.col(vec_col)), 6).alias("cosine")
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
    if isinstance(max_bucket_rows, str) and max_bucket_rows != "auto":
        raise ValueError(
            f"max_bucket_rows must be an int, 'auto' or None, got {max_bucket_rows!r}"
        )
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
    bkts = plane_buckets_udf(planes, n_planes, n_tables=1)
    bucketed = emb.withColumn("_bucket", F.element_at(bkts(F.col(vec_col)), 1))

    qbits = 0
    for b, plane in enumerate(planes):
        if sum(q * p for q, p in zip(query, plane)) >= 0:
            qbits += 2 ** b
    probe = [
        bb
        for bb in range(2 ** n_planes)
        if bin(bb ^ qbits).count("1") <= multiprobe_hamming
    ]

    cosq = cosine_to_query_udf(query)
    return (
        bucketed.filter(F.col("_bucket").isin(probe))
        .select(F.col(id_col).alias("vec_id"), F.round(cosq(F.col(vec_col)), 6).alias("cosine"))
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
    # ALL tables' buckets from ONE corpus scan (the Arrow fold-left
    # kernel computes every table's bucket bits in one numpy pass —
    # round 6; bit-exact per the kernel contract above). The VERIFY is
    # per-bucket too (round 6): the old shape generated candidate pairs
    # with a (t,bucket) self-join, distinct'd them, then re-attached
    # both vectors by id — shuffling two dim-double arrays PER PAIR
    # (~1 KB × millions of candidates at the 10x bench world, the
    # dominant cost). Now each vector moves ONCE per table to its
    # bucket (guide-§8 shape: move heavy bytes once, decide in place):
    # one grouped Arrow kernel emits the bucket's upper-triangle
    # (id_a < id_b) fold-left dots and norms, Column algebra computes
    # the identical round(6) cosine, and the cross-table duplicate
    # candidates collapse in the SAME distinct that previously dedup'd
    # the candidate pairs (identical fold ⇒ identical cosine bits).
    all_planes = [hyperplane(i, dim) for i in range(n_tables * n_planes)]
    bkts = plane_buckets_udf(all_planes, n_planes, n_tables)
    bv = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(bkts(F.col(vec_col))).alias("t", "bkt"),
    )
    if max_bucket_rows is not None:
        # persist: the guard's agg and the grouped verify both read one
        # computation of the bucket projection (eviction under memory
        # pressure just recomputes)
        bv = bv.persist()
        check_bucket_load(
            bv.select(F.concat_ws(":", "t", "bkt").alias("_bucket")),
            "_bucket",
            max_bucket_rows,
            n_bucket_space=n_tables * (1 << min(n_planes, 40)),
        )
    id_type = dict(emb.dtypes)[id_col]
    kernel = _bucket_pair_cosine_kernel()
    raw = bv.groupBy("t", "bkt").applyInPandas(
        kernel, f"id_a {id_type}, id_b {id_type}, _dot double, _na double, _nb double"
    )
    # cosine assembled in Column land — same division order and the same
    # HALF_UP round(6) as before; distinct collapses cross-table dupes
    # (bit-identical fold ⇒ bit-identical doubles)
    return (
        raw.withColumn("cosine", F.round(F.col("_dot") / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )


def _bucket_pair_cosine_kernel(chunk_rows: int = 1024):
    """applyInPandas kernel for one (table, bucket) group: emit the
    upper triangle (id_a < id_b by VALUE) with fold-left pair dots and
    per-vector norms. Chunked over rows so a guard-limit bucket
    (65k rows) never materializes an m×m matrix at once."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            ids0 = pdf["id"].to_numpy()[:0]
            z = np.array([], dtype=np.float64)
            return pd.DataFrame({"id_a": ids0, "id_b": ids0, "_dot": z, "_na": z, "_nb": z})
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        V = np.stack(pdf["v"].to_numpy())[order].astype(np.float64, copy=False)
        d = V.shape[1]
        nacc = np.zeros(m, dtype=np.float64)
        for j in range(d):
            nacc += V[:, j] * V[:, j]
        nrm = np.sqrt(nacc)
        outs = []
        for lo in range(0, m - 1, chunk_rows):
            hi = min(lo + chunk_rows, m - 1)
            A = V[lo:hi]
            acc = np.zeros((hi - lo, m), dtype=np.float64)
            for j in range(d):
                acc += A[:, j : j + 1] * V[:, j]
            ii, kk = np.triu_indices_from(acc, k=lo + 1)
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ids[ii + lo],
                        "id_b": ids[kk],
                        "_dot": acc[ii, kk],
                        "_na": nrm[ii + lo],
                        "_nb": nrm[kk],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return kernel


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
    cosq = cosine_to_query_udf(query)
    return (
        assigned.filter(F.col("ivf_list").isin(probe))
        .select(F.col(id_col).alias("vec_id"), F.round(cosq(F.col(vec_col)), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
