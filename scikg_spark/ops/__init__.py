"""Training-data pipeline operators over the driver's document/embedding
tables: deduplication (exact / MinHash-LSH / n-gram Jaccard / SimHash),
similarity search, and text analysis. Each operator ships as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle string — both registered through ``__spark_entry__``."""
