"""jimmy_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch engine (NOT a port) with the data-processing capabilities of
the reference (marph91/jimmy, see /root/reference and SURVEY.md): every
image+caption record in a columnar table is treated as a geo-referenced
asset. The engine provides:

- pure-NumPy image codecs (PNG/BMP real; a deterministic lossy stand-in for
  JPEG because no image libs exist in this container — plumbing is real),
- deterministic georeferencing phash -> fixed-point (lat_e7, lon_e7),
- hierarchical hex cell IDs (H3-style, res 7-9) and genuine S2 cell IDs
  (levels 12-16), vectorized NumPy inside Arrow/pandas UDFs,
- ray-casting point-in-polygon against broadcast STR-packed polygon sets,
- kNN via hex-ring expansion + window top-k,
- XYZ WebMercator raster-tile assignment,
- salted two-stage aggregation for hot-cell skew,
- per-partition lineage/metrics checkpoint table with idempotent resume.

All boundary decisions use integer fixed-point math (coords scaled 1e7) so
results are exactly reproducible across parallelism levels and match the
DuckDB SQL oracles used by the correctness driver.
"""

__version__ = "0.1.0"
