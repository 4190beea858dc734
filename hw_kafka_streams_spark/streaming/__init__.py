"""Structured Streaming layer.

Submodules: serde (Message JSON + changelog compaction), pipeline (the
reference topology + per-batch GlobalKTable refresh), windows
(watermarked tumbling/sliding/session + streaming dedup), stateful
(applyInPandasWithState TTL counts / Misra-Gries +
transformWithStateInPandas timer sessions), neardup (incremental
MinHash-LSH dedup over a persistent band-partitioned index), prep
(streaming LLM data prep).
"""
