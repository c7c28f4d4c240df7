"""Classification stage: taxonomy flatten, validity partition (F11),
explode sink (K5), lookup join (J4), batching (O4), token sum (A7)."""

import pytest
from pyspark.sql import functions as F

from course_scraper_spark.operators import classify as C
from course_scraper_spark.storage.snaptable import SnapshotTable

TAXONOMY = {
    "ag": {
        "_description": "agriculture",
        "ag.crops": {"_description": "crops"},
        "ag.animal": {"_description": "animal science"},
    },
    "cs": {
        "_description": "computing",
        "cs.systems": {"_description": "systems"},
        "cs.theory": {"_description": "theory"},
    },
    "hum": {"_description": "humanities"},
}


def test_flatten_taxonomy_matches_reference_recursion():
    flat = C.flatten_taxonomy(TAXONOMY)
    ids = {t[0] for t in flat}
    assert ids == {"ag", "ag.crops", "ag.animal", "cs", "cs.systems", "cs.theory", "hum"}
    by_id = {t[0]: t for t in flat}
    assert by_id["ag.crops"][1] == "ag" and by_id["ag.crops"][2] == 1
    assert by_id["hum"][1] is None and by_id["hum"][2] == 0


def test_validity_partition(spark):
    tax = C.taxonomy_df(spark, TAXONOMY)
    raw = spark.createDataFrame(
        [
            ("c1", ["cs.systems", "nope", "ag"]),
            ("c2", ["bogus"]),
            ("c3", ["hum", "cs.theory"]),
        ],
        "course_id string, labels array<string>",
    )
    valid, invalid = C.validate_labels(raw, tax)
    v = {(r.course_id, r.taxonomy_id) for r in valid.collect()}
    i = {(r.course_id, r.taxonomy_id) for r in invalid.collect()}
    assert v == {("c1", "cs.systems"), ("c1", "ag"), ("c3", "hum"), ("c3", "cs.theory")}
    assert i == {("c1", "nope"), ("c2", "bogus")}


def test_sink_and_lookup_join(spark, tmp_path):
    tax = C.taxonomy_df(spark, TAXONOMY)
    raw = spark.createDataFrame(
        [("c1", ["ag"]), ("c2", ["cs"])], "course_id string, labels array<string>"
    )
    valid, _ = C.validate_labels(raw, tax)
    t = SnapshotTable.create(spark, str(tmp_path / "ct"))
    C.save_classified(t, valid)
    courses = spark.createDataFrame(
        [("c1", "sA"), ("c2", "sB")], "course_id string, source_id string"
    )
    got = C.classified_for_source(t.read(), courses, "sA")
    assert [(r.course_id, r.taxonomy_id) for r in got.collect()] == [("c1", "ag")]


def test_fake_classifier_and_batching(spark):
    tax = C.taxonomy_df(spark, TAXONOMY)
    courses = spark.createDataFrame(
        [(f"c{i}", f"CODE{i}", f"Title {i}", "desc") for i in range(10)],
        "course_id string, course_code string, course_title string, course_description string",
    )
    classified = C.fake_classifier(courses, tax)
    rows = classified.collect()
    assert all(1 <= len(r.labels) <= 2 for r in rows)
    valid, invalid = C.validate_labels(classified.select("course_id", "labels"), tax)
    assert invalid.count() == 0  # classifier only emits taxonomy ids
    assert C.token_usage(classified) > 0
    batched = C.with_batch_ids(courses, batch_size=4)
    sizes = {r.batch_id: r["count"] for r in batched.groupBy("batch_id").count().collect()}
    assert sizes == {0: 4, 1: 4, 2: 2}
