"""Operators: pure ``DataFrame -> DataFrame`` transformations.

Each module maps to a SURVEY.md §2 operator family:

- ``columns``   — projections / renames / casts / audit columns (§2.3)
- ``sampling``  — limits, hash sampling, stratified quotas, grouped top-k (§2.7)
- ``scoring``   — distributed model inference via mapInPandas (§2.10)
- ``datadiff``  — drift histograms + distribution distances (§2.5)
- ``windows``   — event-time window analytics (§2.11)
- ``dedup``     — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup (§2.11)
- ``similarity``— embedding top-k, IVF ANN, embedding near-dup (§2.11)
- ``text``      — language-ID, quality scoring, token counts, fingerprints (§2.11)

Streaming variants of the window operators live in
``spark_pipeline_spark.streaming`` (same expressions, ``readStream`` +
watermark).
"""
