"""Schema validation verdicts (schema_manager.py:202-279 semantics):
valid iff the schema_url page yields ≥1 record with every required field
truthy — engine verdicts must match the single-process oracle's."""

import json

import pytest

from course_scraper_spark.config import SourceConfig
from course_scraper_spark.operators.schema_check import REQUIRED_FIELDS, validate_schemas
from course_scraper_spark.oracle.crawl import PageStore
from course_scraper_spark.oracle.parse import oracle_scrape


def oracle_verdict(source, schema, store):
    res = oracle_scrape([source.schema_url], schema, store)
    return any(
        all(rec.get(f) for f in REQUIRED_FIELDS) for rec in res.records
    )


def test_verdicts_match_oracle(spark, sources, pages, pages_pdf, schemas_pdf):
    schemas = spark.createDataFrame(schemas_pdf)
    store = PageStore(pages_pdf)
    schema_by_sid = {r.source_id: json.loads(r.schema_json) for r in schemas_pdf.itertuples()}
    got = {r.source_id: r.valid for r in validate_schemas(spark, sources, pages, schemas).collect()}
    want = {s.source_id: oracle_verdict(s, schema_by_sid[s.source_id], store) for s in sources}
    assert got == want
    assert any(want.values()), "fixture should have at least one valid schema_url"


def test_hub_schema_url_invalid(spark, sources, pages, schemas_pdf):
    schemas = spark.createDataFrame(schemas_pdf)
    base = sources[0]
    bad = SourceConfig(
        source_id=base.source_id,  # reuse the stored schema
        name="bad",
        root_url=base.root_url,
        schema_url=base.root_url,  # hub page: 0 course blocks
    )
    got = validate_schemas(spark, [bad], pages, schemas).collect()[0]
    assert not got.valid and got.n_records == 0
