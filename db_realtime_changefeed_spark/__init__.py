"""PySpark-native analytics engine with the query/data-processing
capabilities of the `tyth/db-realtime-changefeed` reference.

NOTE ON CITATIONS: the reference tree at /root/reference/ is empty
(zero files — see SURVEY.md §0 for the evidence table), so no
file:line citations into it are possible. The binding spec is
SURVEY.md §2 (operator inventory) + the driver contract in
__spark_entry__.py; docstrings cite those instead.

Design principles (SURVEY.md §1.3/§4):
- DataFrame/SQL only; Catalyst sees every plan. No RDD API.
- Columnar at rest (parquet), vectorized in flight (Arrow pandas_udf
  only where built-ins cannot express the semantics).
- Streams are DataFrames under Structured Streaming; changefeeds are
  CDC-envelope streams materialized via foreachBatch merge.
"""

__version__ = "0.1.0"
