"""Lakehouse table-format integration (Delta Lake), import-gated.

Spark core writes parquet FILES; a 100 TB deployment writes parquet
TABLES with ACID commits, so that MERGE/compaction/time-travel don't
require rewriting directories by hand. This module routes the engine's
merge semantics (operators/merge.py::merge_upsert — the portable
relational form, oracle-checked by q87) through Delta Lake's native
``MERGE INTO`` when the library is present, with the same call-time
gating ml/model.py uses for xgboost: the backend flips the moment
``delta-spark`` (and its JVM extension) appears in the environment,
and tests exercise the full dispatch path with a mock module.

Why Delta first: it is the format whose MERGE maps 1:1 onto
merge_upsert's contract (whole-row update wins, unmatched inserts,
optional delete flag). Iceberg's ``MERGE INTO`` SQL is the same
shape; ``merge_into_sql`` below emits engine-neutral SQL usable on
either catalog.

At scale, the native path beats re-writing the base snapshot (the
relational form's cost) because Delta rewrites only the files whose
keys the CDC batch touches — that is the entire point of the format.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _import_delta():
    """Resolve delta at CALL time (not module-import time) so tests
    can install a mock module and deployments pick up the library
    without engine-code changes."""
    import delta

    return delta


def has_delta() -> bool:
    try:
        _import_delta()
        return True
    except Exception:  # noqa: BLE001
        return False


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as a Delta table (requires delta-spark + the
    configured Spark session extension)."""
    df.write.format("delta").mode(mode).save(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("delta").load(path)


def merge_key_condition(keys: Sequence[str], left: str = "t", right: str = "u") -> str:
    """The equi-join merge condition ``t.k1 = u.k1 AND ...`` shared by
    the Delta builder API and the SQL form."""
    return " AND ".join(f"{left}.{k} = {right}.{k}" for k in keys)


def merge_upsert_delta(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
):
    """Native Delta ``MERGE INTO`` with exactly the semantics of
    operators/merge.py::merge_upsert (q87's oracle-checked contract):

    - matched + delete flag  -> row removed
    - matched                -> whole-row update
    - not matched (non-delete) -> insert

    Returns the DeltaTable handle (callers read the post-merge
    snapshot with :func:`read_delta`). Raises ImportError when
    delta-spark is absent — callers that need a portable answer use
    the relational ``merge_upsert`` instead; the two agree row-for-row
    (asserted by the dispatch test's captured-call contract and the
    q87 oracle).
    """
    delta = _import_delta()
    target = delta.DeltaTable.forPath(spark, target_path)
    cond = merge_key_condition(keys)
    builder = target.alias("t").merge(updates.alias("u"), cond)
    if delete_col is not None:
        builder = builder.whenMatchedDelete(condition=f"u.{delete_col}")
        builder = builder.whenMatchedUpdateAll(condition=f"NOT u.{delete_col}")
        builder = builder.whenNotMatchedInsertAll(condition=f"NOT u.{delete_col}")
    else:
        builder = builder.whenMatchedUpdateAll()
        builder = builder.whenNotMatchedInsertAll()
    builder.execute()
    return target


def merge_into_sql(
    target_table: str,
    source_table: str,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> str:
    """Engine-neutral ``MERGE INTO`` SQL (Delta and Iceberg both
    accept this shape) mirroring merge_upsert's semantics — for
    deployments that manage tables through a catalog rather than
    paths."""
    cond = merge_key_condition(keys)
    if delete_col is not None:
        clauses = (
            f"WHEN MATCHED AND u.{delete_col} THEN DELETE\n"
            f"WHEN MATCHED THEN UPDATE SET *\n"
            f"WHEN NOT MATCHED AND NOT u.{delete_col} THEN INSERT *"
        )
    else:
        clauses = "WHEN MATCHED THEN UPDATE SET *\nWHEN NOT MATCHED THEN INSERT *"
    return (
        f"MERGE INTO {target_table} t\nUSING {source_table} u\nON {cond}\n{clauses}"
    )


def optimize_zorder_delta(
    spark: SparkSession, path: str, cols: Sequence[str]
):
    """Native Delta ``OPTIMIZE ... ZORDER BY (cols)``: compact the
    table's files and cluster them on the interleaved key — the
    managed-table form of sources/writers.py::write_zordered's manual
    layout (same Morton-order idea; Delta additionally tracks the
    file statistics transactionally). Returns the optimize result
    DataFrame handle from the Delta API."""
    delta = _import_delta()
    table = delta.DeltaTable.forPath(spark, path)
    return table.optimize().executeZOrderBy(*cols)


def write_zordered_auto(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> str:
    """Layout router: write ``df`` clustered on (x, y) using Delta's
    native OPTIMIZE ZORDER when delta-spark is importable, else the
    engine's own quantize+Morton parquet layout
    (sources/writers.py::write_zordered — file-rectangle property
    proven in tests/test_layout.py). Returns which backend ran
    ("delta" | "parquet") so pipelines can record the table format.

    Both paths produce files whose (x, y) min/max rectangles are
    compact, so downstream scans prune on either column; the Delta
    path additionally leaves a transactionally consistent table that
    q87-style MERGE and incremental writes can target."""
    if has_delta():
        write_delta(df, path, mode=mode)
        optimize_zorder_delta(df.sparkSession, path, [x_col, y_col])
        return "delta"
    from .writers import write_zordered

    write_zordered(df, path, x_col, y_col, n_files=n_files, mode=mode)
    return "parquet"
