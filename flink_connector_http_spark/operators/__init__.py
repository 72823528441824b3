"""Large-scale training-data pipeline operators (beyond the reference's own
surface, BASELINE.json north star): text analysis, deduplication,
similarity search, multimodal column plumbing. All hot paths are JVM-side
built-in expressions; Python appears only in Arrow-batched ``mapInPandas``
where semantics require it (multimodal decode)."""
