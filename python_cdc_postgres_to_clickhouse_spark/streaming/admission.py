"""Online per-source admission caps (the streaming face of X29
``x_source_cap``): admit the first K documents per source across
micro-batches, drop everything after — the ingestion-time variant of the
per-domain cap, for pipelines that must bound a source's share BEFORE
landing data (the batch cap re-ranks a landed corpus by salted-md5 order;
an online gate cannot re-rank the future, so its keep-order is arrival
order — that semantic difference is the reason both exist).

State per source is ONE counter — state size is |sources|, independent of
stream length, the bounded-state requirement at 100 TB. No timeout: the
cap is a lifetime budget, so idle sources must keep their count (contrast
``stateful.running_user_stats``, where idle state is reclaimable).

Within a micro-batch arrival order is made deterministic by sorting on
doc_id, so chunked replay of the same batches is reproducible
(test-asserted); across batches order is the stream's order by design.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("admit_rank", T.LongType()),
    ]
)

ADMIT_STATE_SCHEMA = T.StructType([T.StructField("n_admitted", T.LongType())])


def admit_first_k(docs: DataFrame, k: int) -> DataFrame:
    """docs(doc_id, source, ...) stream → rows admitted under the per-source
    lifetime cap ``k``, with their admission rank (1-based)."""

    def _admit(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (source,) = key
        n = state.get[0] if state.exists else 0
        out: list[tuple[int, str, int]] = []
        for pdf in pdfs:
            if n >= k:
                break
            for doc_id in pdf["doc_id"].sort_values():
                if n >= k:
                    break
                n += 1
                out.append((int(doc_id), source, n))
        state.update((n,))
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "source", "admit_rank"])

    return docs.groupBy("source").applyInPandasWithState(
        _admit,
        outputStructType=ADMIT_OUTPUT_SCHEMA,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
