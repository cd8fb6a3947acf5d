"""Pre-rotation float-hazard scrub (round-4 brief item 6).

The driver's value hash is the hardest judge of float columns: a
last-ulp difference between Spark's and DuckDB's arithmetic flips a
hash even when both engines are "right".  The repo convention is that
every float-typed OUTPUT column passes through an explicit
``round(x + 1e-9, N)`` (N <= 6) on BOTH sides, which squashes ulp noise
to a shared grid.  This test pins the convention for the queries the
round-3 verdict flagged as float-risky: a float value that does not
survive ``round(v, 6)`` unchanged has NOT been rounded on the Spark
side and is a latent cross-engine hash flip.
"""

import math

import pytest

import __spark_entry__ as E

RISKY = [
    "winsorized_stats",   # percentile edges
    "jl_projection",      # distortion values
    "mad_outliers",       # median ties / robust z
    "weighted_sample",    # ln(u)/w keys
    "embedding_dup_clusters",  # cosine-at-threshold
    "drift_psi",          # eps-smoothed shares
    "ks_drift",           # cumulative shares / sup-norm gap
    "kmv_overlap",        # estimator ratios
    "probe_calibration",  # per-bin rates
]


@pytest.mark.parametrize("name", RISKY)
def test_float_columns_are_round_stable(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    float_cols = [f.name for f in df.schema.fields if f.dataType.typeName() in ("double", "float")]
    rows = df.collect()
    assert rows, name
    for r in rows:
        for c in float_cols:
            v = r[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            assert v == round(v, 6), (
                f"{name}.{c} = {v!r} is not 6dp-round-stable: the Spark "
                "side emits an unrounded double, a cross-engine hash hazard"
            )
