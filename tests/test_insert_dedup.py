"""InsertDedupSink: content-hash block dedup (CH insert_deduplicate)."""

from __future__ import annotations

from python_cdc_postgres_to_clickhouse_spark.streaming.insert_dedup import (
    InsertDedupSink,
    block_hash,
)

SCHEMA = "k bigint, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_resent_block_applies_once_even_under_new_batch_id(spark, tmp_path):
    sink = InsertDedupSink(spark, str(tmp_path / "t"))
    block = [(1, "a"), (2, "b"), (3, "c")]
    sink.process_batch(_df(spark, block), 0)
    sink.process_batch(_df(spark, block), 1)          # resend, NEW batch id
    sink.process_batch(_df(spark, block[::-1]), 2)    # resend, reordered
    assert sink.current().count() == 3
    sink.process_batch(_df(spark, [(4, "d")]), 3)     # genuinely new block
    assert sink.current().count() == 4


def test_block_hash_is_order_insensitive_and_content_sensitive(spark):
    a = block_hash(_df(spark, [(1, "a"), (2, "b")]))
    b = block_hash(_df(spark, [(2, "b"), (1, "a")]))
    c = block_hash(_df(spark, [(1, "a"), (2, "x")]))
    d = block_hash(_df(spark, [(1, "a"), (1, "a")]))  # multiset, not set
    e = block_hash(_df(spark, [(1, "a")]))
    assert a == b
    assert len({a, c, d, e}) == 4
    assert block_hash(_df(spark, [])) is None


def test_dedup_window_evicts_like_clickhouse(spark, tmp_path):
    # CH forgets hashes past replicated_deduplication_window: a block
    # resent AFTER eviction is applied again (documented CH behavior).
    sink = InsertDedupSink(spark, str(tmp_path / "w"), dedup_window=2)
    b1, b2, b3 = [(1, "a")], [(2, "b")], [(3, "c")]
    sink.process_batch(_df(spark, b1), 0)
    sink.process_batch(_df(spark, b2), 1)
    sink.process_batch(_df(spark, b3), 2)   # evicts b1's hash
    sink.process_batch(_df(spark, b1), 3)   # re-applied: out of the window
    assert sink.current().count() == 4
    # ...but a block still inside the window stays deduplicated
    sink.process_batch(_df(spark, b3), 4)
    assert sink.current().count() == 4


def test_empty_batch_is_a_noop(spark, tmp_path):
    sink = InsertDedupSink(spark, str(tmp_path / "e"))
    sink.process_batch(_df(spark, [(1, "a")]), 0)
    sink.process_batch(_df(spark, []), 1)
    assert sink.current().count() == 1


def test_corrupt_hash_record_does_not_wedge_the_sink(spark, tmp_path):
    """A crash mid-record-write may leave torn JSON; the sink must treat
    it as an empty window (at-least-once residual), never raise."""
    import os

    sink = InsertDedupSink(spark, str(tmp_path / "c"))
    sink.process_batch(_df(spark, [(1, "a")]), 0)
    with open(sink._hash_file, "w") as f:
        f.write('["abc", "de')  # torn mid-write
    sink.process_batch(_df(spark, [(2, "b")]), 1)  # must not raise
    assert sink.current().count() == 2
    # the record is healed: dedup works again from here on
    sink.process_batch(_df(spark, [(2, "b")]), 2)
    assert sink.current().count() == 2


def test_hash_record_write_is_atomic(spark, tmp_path):
    """The record lands via temp-file + os.replace — no .tmp residue and
    valid JSON after every batch."""
    import json
    import os

    sink = InsertDedupSink(spark, str(tmp_path / "a"))
    sink.process_batch(_df(spark, [(1, "a")]), 0)
    assert not os.path.exists(sink._hash_file + ".tmp")
    with open(sink._hash_file) as f:
        assert isinstance(json.load(f), list)
