"""mobilitydb_spark — a PySpark-native spatial-join + tiling engine.

A brand-new engine (NOT a port) reimplementing the query semantics of
MobilityDB (reference: /root/reference, a C PostgreSQL extension) on
top of the Spark DataFrame/SQL/Catalyst stack:

- temporal point values (tgeompoint) as nested struct columns
  (see `mobilitydb_spark.types`)
- spatial predicates (intersects/within/dwithin/kNN) as two-phase
  filter+refine joins over a hierarchical cell index
  (see `mobilitydb_spark.cells`, `mobilitydb_spark.joins`)
- all geometry kernels vectorized in numpy behind Arrow-batched
  pandas UDFs — no per-row Python (see `mobilitydb_spark.geo`)
- tile-pyramid materialization over web-mercator XYZ tiles
  (see `mobilitydb_spark.tiles`)
- large-scale text-pipeline operators (dedup, similarity search,
  text stats) in `mobilitydb_spark.datagen`

Design notes live in each module docstring; reference parity
citations use ``file:line`` into /root/reference.
"""

__version__ = "0.1.0"
