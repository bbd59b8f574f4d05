"""Operators: pure ``DataFrame -> DataFrame`` transformations.

Each module maps to a SURVEY.md §2 operator family:

- ``columns``   — projections / renames / casts / audit columns (§2.3)
- ``sampling``  — limits, hash sampling, stratified quotas, grouped top-k (§2.7)
- ``scoring``   — distributed model inference via mapInPandas (§2.10)
- ``training``  — collect-fit-persist trainer (§3.3)
- ``datadiff``  — drift histograms + distribution distances (§2.5)
- ``windows``   — event-time window analytics (§2.11)
- ``dedup``     — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup (§2.11)
- ``similarity``— embedding top-k and ANN (§2.11)
- ``text``      — language-ID, quality scoring, token counts, fingerprints (§2.11)
- ``multimodal``— binary media columns + batched decode plumbing (§2.11)
"""
