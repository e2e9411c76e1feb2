from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from confluent_example_firehose_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True)
def _drain_deferred_caches():
    """Release builder caches deferred by
    caching.materialize_unpersist(defer=True) after every test — the
    production drain points are the driver-contract wrapper and the
    bench loop; in the suite, the test boundary is the equivalent
    'result has been collected' point."""
    yield
    from confluent_example_firehose_spark.caching import drain_pending

    drain_pending()


@pytest.fixture
def lazy_caching(monkeypatch):
    """Plan-shape tests need the PRE-materialization plan: the
    production path eagerly localCheckpoints results before dropping
    builder caches (caching.materialize_unpersist, r10), which replaces
    the returned frame's plan with a checkpoint scan. This fixture
    swaps in a pass-through so the test can explain the real query
    plan; builder caches are left registered for the session (tiny at
    the test SF) because the lazy frame still reads them."""
    import confluent_example_firehose_spark.caching as caching

    monkeypatch.setattr(
        caching,
        "materialize_unpersist",
        lambda result, *cached, **_kw: result,
    )
