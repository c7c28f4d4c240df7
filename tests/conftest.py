import pytest

from course_scraper_spark.session import get_spark
from course_scraper_spark.synth.world import WorldSpec, build_pages, build_schemas, build_sources


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spec():
    return WorldSpec(n_hosts=4, total_pages=140)


@pytest.fixture(scope="session")
def pages_pdf(spec):
    return build_pages(spec)


@pytest.fixture(scope="session")
def pages(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf).cache()


@pytest.fixture(scope="session")
def sources(spec):
    return build_sources(spec)


@pytest.fixture(scope="session")
def schemas_pdf(spec):
    return build_schemas(spec)
