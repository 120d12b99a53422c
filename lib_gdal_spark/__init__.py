"""lib_gdal_spark — a PySpark-native spatial-join + tiling + web-text engine.

A from-scratch re-expression of the query and data-processing capabilities of
GDAL/OGR (reference: nextgis-borsch/lib_gdal, GDAL 3.12.2) as an idiomatic
PySpark engine:

- ``geo``        pure NumPy kernels: WebMercator tile math (GlobalMercator
                 parity, osgeo_utils/gdal2tiles.py:417-503), 64-bit z-order
                 cell ids, exact ray-cast point-in-polygon
                 (ogr/ogrlinearring.cpp:452-521), envelopes, packed STR-tree.
- ``operators``  DataFrame-level operators: two-phase spatial join
                 (ogrlayer.cpp:3824 FilterGeometry discipline), ring-expansion
                 kNN (alg/gdalgrid.cpp:950), rasterize / zonal / overview as
                 cell-grid aggregations, tile pyramid (gdal2tiles semantics),
                 OGR-SQL parity helpers, plus training-data-pipeline ops:
                 dedup (exact/MinHash-LSH/SimHash), ANN similarity, text
                 quality / language-id / fingerprinting, multimodal plumbing.
- ``pages``      deterministic Common-Crawl-style pages table synthesis and
                 the byte-identical ``extract_text`` invariant.
- ``functions``  the SQL-callable catalog (``register_all(spark)``): st_*
                 geometry functions, tile/cell id functions — the twin of
                 the SQLite-dialect catalog (ogrsqlitesqlfunctions.cpp).
- ``plans``      ``run_pipeline``: the `gdal vector pipeline` / ogr2ogr
                 step-DAG as a zero-barrier DataFrame chain.
- ``streaming``  Structured Streaming: windowed/sessionized events,
                 applyInPandasWithState dedup, foreachBatch incremental
                 tile pyramid with idempotent epoch commits.

Everything here is built on public knowledge only: the Apache Spark API and
the reference repo's observable semantics.
"""

__version__ = "0.1.0"
