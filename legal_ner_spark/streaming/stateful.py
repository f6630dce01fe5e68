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


# --- Spark 4 transformWithStateInPandas variant -----------------------------
# The successor API to applyInPandasWithState: typed per-key state handles
# (ValueState/ListState/MapState), timers, and initial-state support.  Both
# variants are kept — applyInPandasWithState for Spark 3.4+ deployments,
# this one for Spark 4 — computing the identical cumulative counts.
#
# RUNTIME REQUIREMENTS (like the spaCy swap point in core/model_tagger.py):
# the RocksDB state store provider AND the google.protobuf package (the
# TWS state-server protocol is protobuf-encoded).  The sandbox verdict,
# final (r5): the JVM side is COMPLETE here (rocksdbjni-9.8.4.jar ships
# in pyspark/jars; spark-sql contains all 15 RocksDBStateStoreProvider
# classes) and pyspark bundles the generated StateMessage_pb2 — the one
# missing piece is the google.protobuf PYTHON RUNTIME, which cannot be
# installed in this sandbox, and a hand-written shim is not viable: the
# generated module needs the runtime's descriptor/builder machinery and
# its byte-exact wire serialization is parsed by the JVM state server,
# so an unfaithful re-implementation would silently corrupt state
# rather than fail.  On any machine with `pip install protobuf` (it is
# in requirements.txt) the parity test below runs as-is; here it
# auto-skips and the applyInPandasWithState twin is the leg exercised
# end-to-end.

try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class _RunningCountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("n_total", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n_batch = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            total = prev + n_batch
            self._count.update((total,))
            yield pd.DataFrame({"canonical": [key[0]], "n_total": [total],
                                "n_batch": [n_batch]})

        def close(self) -> None:
            pass

    def running_statute_counts_tws(statute_mentions_stream: DataFrame
                                   ) -> DataFrame:
        """transformWithStateInPandas form of ``running_statute_counts`` —
        identical output contract, typed ValueState instead of the raw
        GroupState tuple."""
        return (statute_mentions_stream
                .groupBy("canonical")
                .transformWithStateInPandas(
                    _RunningCountProcessor(), OUTPUT_SCHEMA, "update",
                    "ProcessingTime"))
except ImportError:   # pragma: no cover — pre-4.0 Spark
    pass
