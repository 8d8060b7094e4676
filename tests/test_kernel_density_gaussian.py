"""Gaussian kernel for kernel_density (round-4 verdict item 4).

Reference role: spark/src/main/scala/geotrellis/spark/density/
RDDKernelDensityMethods + raster/.../mapalgebra/focal/Kernel (upstream
layout; mount empty) — the reference stamps an arbitrary Kernel,
typically Gaussian double weights. The integer pyramid stays the
oracle default; this golden-checks the double Gaussian option.
"""

import math

import pytest


def _one_point(spark, w=3.0):
    # lon=0.1, lat=-0.1 at zoom 6 (n=64) -> key_col=32, key_row=32
    return spark.createDataFrame([(0.1, -0.1, w)], "lon double, lat double, w double")


def test_gaussian_matches_hand_computed_5x5(spark):
    from geotrellis_spark.operators import zonal as Z

    pts = _one_point(spark)
    out = Z.kernel_density(
        pts, zoom=6, radius=2, weight_expr="w", kernel="gaussian"
    )
    rows = {(r.key_col, r.key_row): r.density for r in out.collect()}
    assert len(rows) == 25
    sigma = 1.0  # default radius/2
    for di in range(-2, 3):
        for dj in range(-2, 3):
            expect = 3.0 * math.exp(
                -(di * di + dj * dj) / (2.0 * sigma * sigma)
            )
            got = rows[(32 + di, 32 + dj)]
            assert got == pytest.approx(expect, rel=1e-12), (di, dj)
    # density is double
    assert dict(out.dtypes)["density"] == "double"


def test_gaussian_sigma_and_superposition(spark):
    from geotrellis_spark.operators import zonal as Z

    # two identical points -> densities double; custom sigma honored
    pts = spark.createDataFrame(
        [(0.1, -0.1, 1.0), (0.1, -0.1, 1.0)],
        "lon double, lat double, w double",
    )
    out = Z.kernel_density(
        pts, zoom=6, radius=1, weight_expr="w", kernel="gaussian", sigma=2.0
    )
    rows = {(r.key_col, r.key_row): r.density for r in out.collect()}
    assert rows[(32, 32)] == pytest.approx(2.0, rel=1e-12)
    assert rows[(33, 32)] == pytest.approx(
        2.0 * math.exp(-1.0 / 8.0), rel=1e-12
    )


def test_pyramid_default_unchanged_and_bad_kernel_raises(spark):
    from geotrellis_spark.operators import zonal as Z

    pts = _one_point(spark)
    out = Z.kernel_density(pts, zoom=6, radius=2, weight_expr="1")
    rows = {(r.key_col, r.key_row): r.density for r in out.collect()}
    assert rows[(32, 32)] == 3  # radius+1-0
    assert rows[(34, 32)] == 1
    assert dict(out.dtypes)["density"] == "bigint"
    with pytest.raises(ValueError):
        Z.kernel_density(pts, zoom=6, kernel="epanechnikov")
