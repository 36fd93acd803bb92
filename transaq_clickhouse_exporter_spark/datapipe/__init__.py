"""Large-scale training-data pipeline operators (the north-star
extensions, BASELINE.json / SURVEY §7.4): deduplication families,
similarity search, text analysis, multimodal columns.

Every operator here is designed for the 100 TB shape: shuffle once on a
key you chose, keep per-row work in whole-stage codegen or Arrow-batched
Pandas UDFs, and make candidate generation (LSH bands, buckets, blocks)
bound the quadratic stages.
"""
