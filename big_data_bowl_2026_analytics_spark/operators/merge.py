"""MERGE INTO (upsert + delete) semantics as a relational composition.

Spark core has no table-level MERGE (that's a Delta/Iceberg writer
feature — import-gated elsewhere); the RESULT of a merge is pure
relational algebra and belongs in the engine: the CDC-batch-applied
snapshot

    merged = (base ANTI⋉ update_keys)  ∪  inserts(updates)

i.e. update rows win whole-row, unmatched base rows survive, rows
flagged as deletes disappear. Combined with
``pipeline/incremental.py``'s dynamic-partition-overwrite writer this
is the idempotent apply-changes loop of a warehouse pipeline.

Scale: one anti join on the merge key — broadcast when the CDC batch
is small (the common case; Catalyst picks it from sizes), shuffle
hash/sort-merge when it isn't. The union is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Apply a keyed update batch to a base snapshot.

    - rows in ``updates`` replace matching ``base`` rows (and insert
      when unmatched)
    - rows where ``updates[delete_col]`` is true remove the key
      entirely (and insert nothing)
    - all other base rows pass through unchanged

    ``updates`` must have at most one row per key (CDC batches are
    key-deduped upstream; enforce with a window if not).
    """
    keys = list(keys)
    if delete_col is not None:
        inserts = updates.where(~F.col(delete_col)).drop(delete_col)
    else:
        inserts = updates
    survivors = base.join(updates.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(inserts)
