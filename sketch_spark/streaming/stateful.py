"""Custom stateful streaming operators via applyInPandasWithState.

The sketch family's mergeability makes most streaming maintenance a
fold (sketch_stream.py); this module covers the genuinely *keyed*
stateful case: per-key running sketch state held in Spark's state
store, updated per micro-batch — the structured-streaming analogue of
the reference's persistent cross-chunk sketch state
(/root/reference/src/sketch.cu:349-412), but keyed and fault-tolerant.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..core import sketch_from_bytes
from ..operators.aggregate import SketchSpec


def keyed_running_sketch(
    stream_df: DataFrame,
    key_col: str,
    spec: SketchSpec,
) -> DataFrame:
    """Per-key running sketch over a stream.

    Output row per (key, micro-batch): key, n_rows seen so far, the
    spec's current estimate summary (HLL estimate / CMCU total / KLL n),
    and the serialized state size.  State = the sketch's own binary
    serialization — the same bytes the batch layer shuffles.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import pyarrow as pa

        if state.exists:
            (blob, n_rows) = state.get
            sketch = sketch_from_bytes(bytes(blob))
        else:
            sketch, n_rows = spec.make(), 0
        for pdf in pdfs:
            col = pa.array(pdf[spec.column].astype(str))
            spec.feed(sketch, col)
            n_rows += len(pdf)
        state.update((sketch.to_bytes(), n_rows))
        if hasattr(sketch, "estimate"):
            summary = float(sketch.estimate())
        elif hasattr(sketch, "total"):
            summary = float(sketch.total)
        else:
            summary = float(getattr(sketch, "n", 0))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_rows": [n_rows],
                "summary": [summary],
                "state_bytes": [len(sketch.to_bytes())],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, n_rows long, summary double, state_bytes long",
        stateStructType="state binary, n_rows long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
