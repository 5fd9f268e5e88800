"""Sources: Kafka/file change-event ingestion, Avro decode, CDC envelopes.

The engine-visible contract mirrors the reference pipeline's ingest path
(Postgres WAL → Debezium → Kafka → Avro-framed messages) but every piece is
testable without a broker: the envelope schema and Avro framing are explicit,
and a directory of files stands in for a topic (SURVEY.md §7).
"""
