"""PSI + KS drift checks: injected drift partition fires, clean don't."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from canned_yaml_spark import drift, fixtures
from canned_yaml_spark.derive import DRIFT_PART


@pytest.fixture(scope="module")
def clips_mid(spark):
    # drift needs statistical mass: 20k rows → ~312/partition
    # (metadata only: tiny payloads)
    df = fixtures.clips_df(spark, 20_000, inject=False, max_samples=4) \
        .select("dur_ms", "part_id").cache()
    df.count()
    return df


def test_psi_fires_only_on_drift_part(spark, clips_mid, suite):
    dc = suite.drift_checks[0]
    exp = fixtures.reference_hist_df(spark)
    psi = {r.part_id: r.psi for r in
           drift.psi_per_partition(clips_mid, dc, exp).collect()}
    assert len(psi) == 64
    assert psi[DRIFT_PART] > dc.psi_max
    clean = [v for p, v in psi.items() if p != DRIFT_PART]
    assert max(clean) < dc.psi_max
    v = drift.psi_violations(clips_mid, dc, exp).collect()
    assert {r.part_id for r in v} == {DRIFT_PART}
    assert all(r.severity == 1 for r in v)  # WARN per spec


def test_psi_self_reference_mode(spark, clips_mid, suite):
    # expected=None → global blend as reference; drift part must still
    # be the extreme
    dc = suite.drift_checks[0]
    psi = drift.psi_per_partition(clips_mid, dc, None).collect()
    top = max(psi, key=lambda r: r.psi)
    assert top.part_id == DRIFT_PART


def test_ks_fires_only_on_drift_part(spark, clips_mid, suite):
    dc = suite.drift_checks[0]
    ref = fixtures.reference_dur_sample()
    ks = {r.part_id: r for r in
          drift.ks_per_partition(clips_mid, dc, ref).collect()}
    assert ks[DRIFT_PART].p_value < dc.ks_alpha
    others = [r.p_value for p, r in ks.items() if p != DRIFT_PART]
    assert min(others) > dc.ks_alpha
    v = drift.ks_violations(clips_mid, dc, ref).collect()
    assert {r.part_id for r in v} == {DRIFT_PART}


def test_ks_statistic_math():
    # identical samples → D=0, p=1; disjoint → D=1, p~0
    a = np.arange(1000, dtype=float)
    d, p = drift._ks_2samp(a, a)
    assert d == 0.0 and p > 0.99
    d, p = drift._ks_2samp(a, a + 10_000)
    assert d == 1.0 and p < 1e-10


def test_bucketize_clamps_and_drops_nulls(spark, suite):
    dc = suite.drift_checks[0]
    df = spark.createDataFrame(
        [(0, -50), (0, 0), (0, 11999), (0, 999999), (0, None)],
        "part_id int, dur_ms int")
    rows = {(r.bucket): r.cnt for r in drift.bucketize(df, dc).collect()}
    assert rows.get(0) == 2          # -50 clamped + 0
    assert rows.get(19) == 2         # 11999 + clamp(999999)
    assert sum(rows.values()) == 4   # NULL dropped


def test_weighted_ks_equals_raw():
    # the pre-aggregated (value, count) form must reproduce the raw
    # statistic exactly — ECDF steps only occur at sample points
    import numpy as np

    rng = np.random.RandomState(7)
    for _ in range(50):
        a = rng.randint(200, 10000, size=rng.randint(1, 400)).astype(float)
        ref = rng.randint(200, 12000, size=777).astype(float)
        vals, cnts = np.unique(a, return_counts=True)
        d1, p1 = drift._ks_2samp(a, ref)
        d2, p2, n = drift._ks_2samp_weighted(vals, cnts, ref)
        assert abs(d1 - d2) < 1e-12 and abs(p1 - p2) < 1e-12 and n == a.size


def test_ks_jvm_matches_pandas(spark, clips_mid, suite):
    # the codegen KS (windows + HOF p-value) must reproduce the
    # applyInPandas/numpy statistic to float precision
    import numpy as np
    from canned_yaml_spark import drift, fixtures
    dc = suite.drift_checks[0]
    ref = fixtures.reference_dur_sample()
    jvm = {r.part_id: r for r in
           drift.ks_per_partition_sql(clips_mid, dc, ref).collect()}
    pdv = {r.part_id: r for r in
           drift.ks_per_partition(clips_mid, dc, ref).collect()}
    assert set(jvm) == set(pdv)
    for pid in jvm:
        assert jvm[pid].n == pdv[pid].n
        assert abs(jvm[pid].ks_stat - pdv[pid].ks_stat) < 1e-12
        assert abs(jvm[pid].p_value - pdv[pid].p_value) < 1e-9
