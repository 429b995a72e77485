"""pincspark — a PySpark-native analytics engine with the query and
data-processing capabilities of azzulhisham/PincDataWareHouse.

The reference (/root/reference) is a maritime AIS/IVEF vessel-tracking
warehouse built from socket services + pandas/polars scripts. This package
re-expresses every capability idiomatically on Spark:

- ``pincspark.catalog``     — typed StructType schemas (the catalog)
- ``pincspark.functions``   — scalar/column function library (NMEA decode
                              primitives, text analysis, vector math)
- ``pincspark.decode``      — the AIS bit-field decode kernel (pandas UDF +
                              pure column-expression fast paths)
- ``pincspark.operators``   — relational operators as DataFrame->DataFrame
                              functions (as-of join, latest-per-key, dedup,
                              similarity search, geo joins, graph ranking,
                              sampling/caps, layout, sketches, ...)
- ``pincspark.sources``     — batch/streaming source readers
- ``pincspark.streaming``   — stateful streaming operators (fragment
                              reassembly, zone entry/exit) and sinks
- ``pincspark.plans``       — the query catalog wired into __spark_entry__
"""

__version__ = "0.1.0"
