"""Custom stateful streaming operator: cumulative per-statute mention
counts across micro-batches via ``applyInPandasWithState``.

The batch KG pipeline needs no cross-document state (SURVEY.md §2.8), but
a monitoring surface does: "how often has each canonical statute been
cited so far" as the corpus streams in.  This operator keeps one counter
per statute key in Spark's state store — the `transformWithState`/
`applyInPandasWithState` idiom — and emits updated totals each batch.

State shape: (n_total: long).  No watermark/timeout: statute keys are a
small closed-ish set; state is bounded by key cardinality, not stream
length.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("canonical", T.StringType(), False),
    T.StructField("n_total", T.LongType()),
    T.StructField("n_batch", T.LongType()),
])

STATE_SCHEMA = T.StructType([T.StructField("n_total", T.LongType())])


def _update(key, pdfs, state: GroupState):
    n_batch = 0
    for pdf in pdfs:
        n_batch += len(pdf)
    prev = state.get[0] if state.exists else 0
    total = prev + n_batch
    state.update((total,))
    yield pd.DataFrame({"canonical": [key[0]], "n_total": [total],
                        "n_batch": [n_batch]})


def running_statute_counts(statute_mentions_stream: DataFrame) -> DataFrame:
    """statute_mentions_stream: streaming DF with a ``canonical`` column
    (e.g. statute_clusters projection of the per-batch extraction).
    Returns a streaming DF of cumulative counts."""
    return (statute_mentions_stream
            .groupBy("canonical")
            .applyInPandasWithState(_update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
