"""Large-scale training-data-pipeline operators over text/embedding corpora.

Each module pairs a Spark-native implementation (built-in JVM expressions
only — no Python on the hot path) with an ``*_oracle_sql`` generator that
emits the equivalent DuckDB SQL from the same constants, so the driver's
side-by-side correctness gate (CORRECTNESS_r{N}.json) checks them
value-for-value.
"""
