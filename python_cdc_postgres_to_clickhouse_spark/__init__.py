"""PySpark-native analytics engine with the capabilities of the reference
CDC pipeline (khasanjon-dev/Python-CDC-Postgres-to-Clickhouse).

The reference ingests Postgres WAL changes through Debezium/Kafka (Avro,
Confluent Schema Registry) and delegates the analytic query surface to a
provisioned ClickHouse server (reference docker-compose.yml:155-174). This
package replaces *both* halves with one Spark program:

- ``sources``   — Kafka/file change-event sources, Avro decode (both Confluent
                  wire-format and raw framings), Debezium envelope handling.
- ``operators`` — CDC state operators (latest-by-key upsert, as-of join) and
                  LLM-data-pipeline extensions (dedup, similarity, text stats).
- ``queries``   — the relational query surface (ClickHouse's delegated job),
                  declared as named DataFrame builders with DuckDB oracles.
- ``streaming`` — Structured Streaming: watermarks, windows, stateful dedup,
                  foreachBatch upsert sinks.
- ``plans``     — plan-inspection helpers used to verify pushdown/broadcast.

Design stance (SURVEY.md §7): DataFrame/SQL only, no custom Catalyst rules,
Parquet as the table format, everything testable without Kafka/Postgres.
"""

__version__ = "0.1.0"
