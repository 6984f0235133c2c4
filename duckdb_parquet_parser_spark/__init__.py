"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``sputnik89/duckdb-parquet-parser``
(a C++17 Parquet parser/writer), re-expressed Spark-first.

Layout
------
- :mod:`.session`   — SparkSession factory tuned for local[n] testing and
  large-cluster defaults (AQE, shuffle partitions, Arrow).
- :mod:`.catalog`   — fixture-table loading / temp-view registration.
- :mod:`.inspect`   — schema / row-group / page metadata, global data-page
  index, raw page bytes, byte-capped multi-page read, lazy page iterator,
  distributed fleet layout audit (reference ops R1, R2, R6-R8 —
  parquet_reader.cpp:14-121,182-278,559-605).
- :mod:`.operators` — query operators: scans, filters, positional streams,
  chunk index, relational coverage, dedup, similarity, text analysis.
- :mod:`.sources`   — Parquet sink parity (writer ops W1-W6), including the
  standalone byte-level reference-style writer (:mod:`.sources.pywriter`).
- :mod:`.streaming` — Structured Streaming windows + stateful sessionization.
- :mod:`.plans`     — plan-inspection helpers (pushdown/broadcast asserts).
"""

__version__ = "0.1.0"
