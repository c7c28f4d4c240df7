"""ANN operators: brute force is exact; LSH/IVF return the query's own
neighborhood and never fabricate ids."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    import math

    rows = []
    for i in range(64):
        angle = (i % 16) * (math.pi / 8)
        rows.append((i, [math.cos(angle), math.sin(angle), float(i % 3) * 0.1, 0.5]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


QUERY = [1.0, 0.0, 0.0, 0.5]


def test_brute_force_topk_exact(emb):
    got = [r.vec_id for r in S.brute_force_topk(emb, QUERY, k=5).collect()]
    rows = emb.collect()

    def cos(v):
        import math

        dot = sum(a * b for a, b in zip(v, QUERY))
        return dot / (math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in QUERY)))

    want = [r.vec_id for r in sorted(rows, key=lambda r: (-round(cos(r.embedding), 6), r.vec_id))[:5]]
    assert got == want


def test_lsh_topk_subset_and_quality(emb):
    exact = [r.vec_id for r in S.brute_force_topk(emb, QUERY, k=3).collect()]
    approx = [r.vec_id for r in S.lsh_topk(emb, QUERY, k=3, n_planes=3, multiprobe_hamming=1).collect()]
    assert len(approx) == 3
    assert exact[0] == approx[0]  # the best match survives bucketing


def test_ivf_topk_runs_and_finds_best(emb):
    exact_best = S.brute_force_topk(emb, QUERY, k=1).collect()[0].vec_id
    got = [r.vec_id for r in S.ivf_topk(emb, QUERY, k=3, n_lists=4, nprobe=4).collect()]
    assert exact_best in got  # nprobe=all lists -> must contain the true best


def test_lsh_near_dup_pairs_finds_near_dups(spark):
    from course_scraper_spark.operators.similarity import lsh_near_dup_pairs

    # 3 clusters of near-identical vectors + isolated points, dim 8
    import math
    def unit(seed):
        vals = [math.sin(seed * 13.7 + j) for j in range(8)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]
    rows = []
    vid = 0
    for c in range(3):
        base = unit(c + 1)
        for k in range(3):  # jittered copies: cosine ~0.999
            v = [x + 0.01 * math.sin(vid * 7.3 + j) for j, x in enumerate(base)]
            rows.append((vid, v)); vid += 1
    rows.append((vid, unit(99))); vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in lsh_near_dup_pairs(emb, dim=8, threshold=0.99).collect()}
    # brute-force expected pairs
    import itertools
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)); nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)
    vecs = dict(rows)
    want = {(a, b) for a, b in itertools.combinations(sorted(vecs), 2) if cos(vecs[a], vecs[b]) >= 0.99}
    # within-cluster pairs must all be found (near-identical vectors land
    # in the same bucket in every table w.h.p.); no false pairs survive
    # the exact-cosine verify
    assert got <= want
    assert len(got) >= len(want) - 1  # allow one boundary-angle miss


def test_kmeans_sample_unbiased_on_id_ordered_clusters(spark):
    """Hash-mod sampling must see every natural cluster even when id
    order correlates with cluster membership — the first-N-by-id prefix
    sample sees only the earliest clusters and k-means can never place a
    centroid where the sample has no points."""
    import math

    import numpy as np

    def unit(seed, dim=6):
        vals = [math.sin(seed * 9.1 + j * 1.7) for j in range(dim)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    centers = [unit(s) for s in (1, 40, 77)]
    rows = []
    vid = 0
    for c, base in enumerate(centers):  # ids 0-199 cluster0, 200-399 cluster1, ...
        for k in range(200):
            v = [x + 0.02 * math.sin(vid * 3.3 + j) for j, x in enumerate(base)]
            rows.append((vid, v))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def nearest_cos(center, cents):
        cu = np.array(center) / np.linalg.norm(center)
        best = -2.0
        for _, cv in cents:
            cvu = np.array(cv) / np.linalg.norm(cv)
            best = max(best, float(cu @ cvu))
        return best

    # sample_size=100 < 600 rows: the hash-mod sample spans all clusters
    cents = S.kmeans_centroids(emb, n_lists=3, sample_size=100)
    for c in centers:
        assert nearest_cos(c, cents) > 0.98

    # determinism: same input -> identical centroids
    cents2 = S.kmeans_centroids(emb, n_lists=3, sample_size=100)
    assert cents == cents2

    # the prefix-sample twin (the old behavior) misses clusters 2 and 3:
    # its best centroid for the last cluster is far off
    prefix = emb.orderBy("vec_id").limit(100)
    cents_prefix = S.kmeans_centroids(prefix, n_lists=3, sample_size=100)
    assert nearest_cos(centers[2], cents_prefix) < 0.9


def test_round6_kernels_bit_equal_column_forms(spark):
    """Round 6: the Arrow fold-left kernels must match the Column HOF
    reference forms BIT-exactly (not just to 6 decimals) — the kernels
    replicate Catalyst's left-fold IEEE order by construction."""
    from pyspark.sql import functions as F

    from course_scraper_spark.operators.similarity import (
        cosine,
        cosine_to_query_udf,
        hyperplane,
        lsh_bucket_col,
        pair_dot_udf,
        plane_buckets_udf,
        vec_norm_udf,
        _dot,
        _norm,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.transform(F.col("embedding"), lambda x: x.cast("double")))
        .cache()
    )
    dim = len(emb.select("embedding").first()[0])
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    # cosine-to-query: raw doubles, no rounding — must be bit-identical
    cosq = cosine_to_query_udf(q)
    qcol = F.array(*[F.lit(float(v)) for v in q])
    rows = emb.select(
        cosq(F.col("embedding")).alias("k"),
        cosine(F.col("embedding"), qcol).alias("c"),
    ).collect()
    assert all(r["k"] == r["c"] for r in rows)

    # norm kernel vs Column _norm
    nrm = vec_norm_udf()
    rows = emb.select(
        nrm(F.col("embedding")).alias("k"), _norm(F.col("embedding")).alias("c")
    ).collect()
    assert all(r["k"] == r["c"] for r in rows)

    # bucket bits vs lsh_bucket_col, both tables
    n_planes, n_tables = 4, 2
    planes_flat = [hyperplane(i, dim) for i in range(n_tables * n_planes)]
    bkts = plane_buckets_udf(planes_flat, n_planes, n_tables)
    for t in range(n_tables):
        tbl_planes = planes_flat[t * n_planes : (t + 1) * n_planes]
        rows = emb.select(
            F.element_at(bkts(F.col("embedding")), t + 1).alias("k"),
            lsh_bucket_col(F.col("embedding"), tbl_planes).alias("c"),
        ).collect()
        assert all(r["k"] == r["c"] for r in rows)

    # pair dot vs Column _dot over a small self-join
    a = emb.limit(20).select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.limit(20).select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    dot = pair_dot_udf()
    rows = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .select(dot(F.col("va"), F.col("vb")).alias("k"), _dot(F.col("va"), F.col("vb")).alias("c"))
        .collect()
    )
    assert rows and all(r["k"] == r["c"] for r in rows)
    emb.unpersist()
