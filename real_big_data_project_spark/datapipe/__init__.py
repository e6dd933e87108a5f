"""Training-data pipeline operators: corpus dedup families, similarity
search, text analysis, and multimodal plumbing.

The reference engine (petitwhito/real_big_data_project) stops at relational
ETL + tick analytics; this layer adds the operations a 100 TB training-data
pipeline needs on top of the same Spark-first engine. Everything is pure
DataFrame/Column expressions (JVM-side) except the multimodal decode stubs,
which are Arrow-batched ``mapInPandas`` by design.
"""
