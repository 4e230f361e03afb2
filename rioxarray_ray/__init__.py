"""rioxarray_ray — a from-scratch Ray-Data-native raster tiling + spatial join engine.

Reproduces the operator semantics of corteva/rioxarray (reproject / clip /
clip_box / pad / merge / interpolate_na / nodata-CRS-transform management)
re-expressed as Ray Data pipelines over Arrow tables of image + caption rows,
per BASELINE.json's north rule.  No GDAL / rasterio / pyproj / xarray at
runtime: every numeric kernel is pure numpy (``rioxarray_ray.kernels``), and
all distribution is ``ray.data.Dataset`` -> ``map_batches`` / ``groupby``.

Layout:
  kernels/    pure-numpy geospatial math (no Ray imports) — unit-testable alone
  sources/    corpus synthesis + parquet/lance IO
  stages/     Ray Data batch transforms (decode, tile, warp actor pools, joins)
  functions/  text / dedup / similarity ops for training-data pipelines
  pipelines/  end-to-end composed pipelines (the flagship path)
  state/      checkpoint manifests + lineage for resumable runs
"""

__version__ = "0.1.0"

from .options import get_option, set_options  # noqa: E402,F401 (public API)
