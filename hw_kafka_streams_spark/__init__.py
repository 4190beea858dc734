"""hw_kafka_streams_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``svolga/hw-kafka-streams`` (a Kafka Streams message censor/block
pipeline — see /root/reference, SURVEY.md) as an idiomatic Spark
DataFrame / SQL / Structured Streaming engine, extended with the
relational-analytics and LLM-data-pipeline operators a 100 TB
training-data platform needs (dedup, similarity search, text
analysis, multimodal columns).

Design principles (SURVEY.md §7):
- DataFrame/SQL first: declare logical plans, let Catalyst pick
  physical strategies (broadcast vs sort-merge, pushdown, pruning).
- Broadcast small dims (the reference's GlobalKTable analog).
- Anti-join instead of procedural null-then-filter (reference
  KafkaStreamApp.java:157-166).
- Pandas UDFs only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"
