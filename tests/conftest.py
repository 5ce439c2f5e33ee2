from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ocrd_tesserocr_spark.session import get_spark

    s = get_spark("local[4]", shuffle_partitions=4, app_name="tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    from ocrd_tesserocr_spark.corpus import pages_df

    return pages_df(spark, SF_SMOKE).cache()


@pytest.fixture(scope="session")
def oracle_records():
    """Pure-Python (no Spark) extraction of the whole smoke corpus."""
    from ocrd_tesserocr_spark.corpus import pages_records
    from ocrd_tesserocr_spark.oracle import extract_document

    recs = pages_records(SF_SMOKE)
    return [(r, extract_document(r["html"])) for r in recs]
