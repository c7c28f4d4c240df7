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
