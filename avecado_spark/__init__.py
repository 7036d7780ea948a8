"""avecado_spark — a from-scratch PySpark-native vector-tile + spatial-join
engine with the query semantics of MapQuest/avecado.

Reference semantics: /root/reference (avecado, C++11). This package is NOT a
port — it re-expresses the reference's observable behavior (tile math, MVT
encoding, post-processors, spatial joins) as idiomatic PySpark: DataFrame/SQL
plans optimized by Catalyst, with vectorized pandas/Arrow UDFs only where the
built-in operators cannot express the semantics (geometry clipping, MVT byte
assembly, izer pipelines).

Layout
------
functions/  pure numpy/python kernels + Spark column expressions
            (mercator tile math, WKT, geometry predicates, MVT wire codec)
operators/  DataFrame-level operators (tile keys, tile encode, adminizer
            spatial join, generalizer, unionizer, dedup, similarity, text)
sources/    input synthesis + readers/sinks (pages table, tile pbf sink,
            checkpoint manifest)
plans/      post-processor (izer) pipeline config + zoom gating
streaming/  Structured Streaming equivalents for the events table
"""

__version__ = "0.1.0"

WORLD_SIZE = 40075016.68  # Web-Mercator world circumference in meters
                          # (reference: src/util.cpp:3 "#define WORLD_SIZE")
WORLD_SIZE_MM = 40075016680  # integer millimeters — used for exact integer
                             # tile assignment (oracle-parity path)
