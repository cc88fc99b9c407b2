"""Custom stateful streaming operator: first-seen dedup over a stream.

The streaming twin of functions.dedup.exact_dedup — keeps only the first
occurrence of each key across micro-batches using per-group state
(applyInPandasWithState). At training-data scale this is the online dedup
leg: the batch MinHash/exact passes clean history, this filters the live
stream against keys already admitted.

State layout: one row per key group = the set of fingerprints admitted so
far (bounded by the key-group cardinality; shard the key space by group_col
to bound per-group state).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("bucket", LongType()),
    StructField("key", StringType()),
    StructField("first_batch_id", LongType()),
])
STATE_SCHEMA = StructType([StructField("seen", StringType())])


def _dedup_fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
              ) -> Iterator[pd.DataFrame]:
    seen = set()
    if state.exists:
        (blob,) = state.get
        if blob:
            seen = set(blob.split("\x00"))
    batch_id = state.getCurrentProcessingTimeMs()  # informational only
    out_keys = []
    for pdf in pdfs:
        for k in pdf["key"]:
            if k not in seen:
                seen.add(k)
                out_keys.append(k)
    state.update((("\x00".join(sorted(seen))),))
    yield pd.DataFrame({"bucket": [key[0]] * len(out_keys),
                        "key": out_keys,
                        "first_batch_id": [batch_id] * len(out_keys)})


def stream_first_seen(events: DataFrame, key_col: str = "key",
                      bucket_col: str = "bucket") -> DataFrame:
    """Streaming first-seen filter: one output row per novel key.

    ``events`` must carry (bucket, key) — bucket shards the state. Works on
    a readStream DataFrame; in batch mode fall back to exact_dedup."""
    src = events.selectExpr(f"{bucket_col} as bucket", f"{key_col} as key")
    if not events.isStreaming:
        from ..functions.dedup import exact_dedup
        import pyspark.sql.functions as F
        return (src.groupBy("bucket", "key").count()
                .select("bucket", "key", F.lit(0).cast("long").alias("first_batch_id")))
    return (src.groupBy("bucket")
            .applyInPandasWithState(
                _dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
