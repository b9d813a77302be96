"""plateau_gis_converter_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``fossabot/plateau-gis-converter`` ("nusamai") as streaming ``ray.data.Dataset``
stages over an Arrow-backed image+caption table, per BASELINE.json's north rule.

Layout:
  kernels/    pure numpy/pyarrow math (no Ray): WebMercator, Hilbert tile ids,
              the 3D-Tiles non-square tiling scheme, geojson-vt-style polygon
              clippers, point-in-polygon + grid index, cell keys, MinHash et al.
  sources/    table readers + the deterministic synthetic image-table generator
  stages/     map_batches stage callables (stateless fns and actor-pool classes)
  pipelines/  end-to-end Dataset pipelines (flagship tiling job, dedup, knn, ...)
  state/      per-partition lineage manifest for resumable runs
  sinks/      grouped / partitioned writers (parquet tile sink, MVT-style encode)
"""

__version__ = "0.1.0"
