"""Sequence packing for LLM training-data pipelines.

Packing concatenates documents into fixed-capacity context windows
(e.g. 4k/8k tokens) so training batches carry no padding waste. The
assignment rule here is greedy NEXT-FIT in a deterministic document
order: keep appending documents to the current bin until the next one
would overflow, then open a new bin. Next-fit is the rule large
pipelines actually use — it is one sequential pass, deterministic,
and within a constant factor of optimal fill for document-length
distributions — whereas best-fit/first-fit need random access to all
open bins and do not stream.

Scale design: packing is inherently sequential WITHIN a stream, so
the operator parallelizes ACROSS streams — one Arrow-batched
``applyInPandas`` group per stream key (source, shard, ...). At 100 TB
you pre-shard each source into bounded sub-streams (e.g. by
hash(doc_id) % k) and pack shards independently: bin ids are
(stream, local_bin) pairs, so no cross-shard coordination exists by
construction. The per-group loop is numpy over one Arrow batch —
no row-at-a-time Python against JVM rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    stream_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each row to a (stream-local) bin of ``capacity`` tokens
    by greedy next-fit over ``id_col`` order; rows longer than the
    capacity are truncated to it (they fill a bin alone).

    Output: (id, stream, n_tokens, bin_id, bin_offset) — bin_offset
    is the token position where the document starts inside its bin.
    """
    out_schema = (
        f"{id_col} long, {stream_col} string, {tokens_col} long, "
        "bin_id long, bin_offset long"
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        toks = pdf[tokens_col].clip(upper=capacity).to_numpy()
        bins, offsets = [], []
        bin_id, fill = 0, 0
        for t in toks:
            if fill + t > capacity and fill > 0:
                bin_id += 1
                fill = 0
            offsets.append(fill)
            bins.append(bin_id)
            fill += int(t)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                stream_col: pdf[stream_col].to_numpy(),
                tokens_col: toks,
                "bin_id": bins,
                "bin_offset": offsets,
            }
        )

    return df.select(
        F.col(id_col), F.col(stream_col), F.col(tokens_col).cast("long").alias(tokens_col)
    ).groupBy(stream_col).applyInPandas(pack, schema=out_schema)
