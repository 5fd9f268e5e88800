"""Structured Streaming surface (SURVEY.md §2.5).

The reference's streaming loop is ``while True: consumer.poll(10)``
(main.py:27-29); here the same semantics are one continuous query: source →
watermark → stateful ops → sink, with offsets checkpointed (D4) instead of
consumer-group commits. A file-based envelope stream stands in for Kafka in
tests — same schema, same downstream operators, swap the source builder for
``sources.kafka.stream_reader`` on a real cluster.
"""
