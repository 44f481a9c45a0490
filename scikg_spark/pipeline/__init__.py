"""Spark pipeline stages. All Python compute is vectorized pandas/Arrow UDFs
(mapInPandas / pandas_udf) — never per-row Python (BASELINE.json input_hint)."""
