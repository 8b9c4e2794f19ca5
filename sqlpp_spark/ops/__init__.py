"""Large-scale data-pipeline operators (beyond the reference surface):
deduplication, similarity search, text analysis, multimodal columns.

All hot paths are JVM-side `pyspark.sql.functions` compositions — no
row-at-a-time Python. Where Python is unavoidable (embedding math at
scale, multimodal decode) we use Arrow-batched Pandas UDFs.
"""
