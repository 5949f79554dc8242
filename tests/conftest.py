"""Shared Spark session + fixture tables for the test suite.

One session for the whole run (JVM startup ~15 s); small deterministic
tables per FIXTURES.md. `python -m pytest -x -q` is the mandated gate
(BASELINE.json input_hint).
"""

from __future__ import annotations

import pytest

from canned_yaml_spark import fixtures
from canned_yaml_spark.session import get_spark

N_SMALL = 2000


@pytest.fixture(scope="session")
def spark():
    s = get_spark("canned_yaml_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def clips(spark):
    df = fixtures.clips_df(spark, N_SMALL).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def clips_clean(spark):
    df = fixtures.clips_df(spark, N_SMALL, inject=False,
                           max_samples=64).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def clips_ref(spark):
    df = fixtures.clips_ref_df(spark, N_SMALL).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def codec_dim(spark):
    return fixtures.codec_dim_df(spark)


@pytest.fixture(scope="session")
def suite(spark, clips):
    from canned_yaml_spark import compile_spec
    return compile_spec("specs/clips.spec.yaml", clips.schema)


@pytest.fixture(scope="session")
def golden():
    return fixtures.golden_rule_counts(N_SMALL)
