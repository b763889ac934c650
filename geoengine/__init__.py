"""geoengine — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of
``databricks-industry-solutions/geospatial-neighborhood-searches``
(reference at /root/reference, Scala/RDD + external NoSQL store) as pure
Spark DataFrame plans: vectorized cell encoding, cell-keyed equi-joins for
candidate pairing, codegen'd great-circle distance refinement, window top-k,
ring-expansion kNN, raster-tile assignment, point-in-polygon + zonal
statistics, spatial analytics (DBSCAN with exact grid contraction,
Getis-Ord hot spots, local/global Moran's I, emerging hot spots with
Mann-Kendall trends, IDW interpolation, grid kernel density),
trajectory/geofence/co-location rollups (batch + streaming), plus
training-data-pipeline operators
(dedup with cluster resolution, similarity search, text analysis, image
payload kernels).

Design notes (SURVEY.md):
  - No RDDs. No per-row Python. Python appears only as Arrow-batched
    pandas UDFs / mapInPandas in the few kernels Spark expressions cannot
    express (bit interleave at high res, ray casting, image decode).
  - The reference's external "NoSQL index + LIKE 'prefix%' per origin row"
    (reference SparkDS.scala:56-98) is replaced by a cell-keyed
    broadcast-or-shuffle equi-join — same candidate semantics, no
    side-channel I/O.
"""

__version__ = "0.1.0"
