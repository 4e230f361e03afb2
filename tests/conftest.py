"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield ray
    ray.shutdown()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def demo_raster(rng):
    """A 40x50 int16 raster with a nodata blob on a 4326 grid — the shared
    fixture shape mirroring MODIS_ARRAY's role in the reference tests."""
    from rioxarray_ray.kernels import affine as aff
    from rioxarray_ray.kernels import crs
    from rioxarray_ray.kernels.raster import Raster

    px = rng.integers(-3000, 3000, size=(1, 40, 50)).astype(np.int16)
    px[0, 8:12, 8:12] = -28672
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    return Raster(px, t, crs.GEOGRAPHIC, nodata=-28672)
