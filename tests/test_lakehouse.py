"""Delta integration dispatch tests (mock-module pattern, like the
xgboost swap path in test_ml.py): the library is absent in this
environment, so assert (a) the gate reports that honestly, (b) a mock
delta module receives exactly the MERGE calls whose semantics match
operators/merge.py::merge_upsert (q87's oracle-checked contract), and
(c) the engine-neutral SQL form encodes the same clauses."""

from __future__ import annotations

import sys
import types

from big_data_bowl_2026_analytics_spark.sources.lakehouse import (
    has_delta,
    merge_into_sql,
    merge_key_condition,
    merge_upsert_delta,
)


def test_gate_reports_absent_library():
    assert "delta" not in sys.modules
    assert has_delta() is False


class _RecordingBuilder:
    def __init__(self, log):
        self.log = log

    def whenMatchedDelete(self, condition=None):
        self.log.append(("matched_delete", condition))
        return self

    def whenMatchedUpdateAll(self, condition=None):
        self.log.append(("matched_update_all", condition))
        return self

    def whenNotMatchedInsertAll(self, condition=None):
        self.log.append(("not_matched_insert_all", condition))
        return self

    def execute(self):
        self.log.append(("execute", None))


class _RecordingTable:
    def __init__(self, log):
        self.log = log

    def alias(self, name):
        self.log.append(("target_alias", name))
        return self

    def merge(self, updates, cond):
        self.log.append(("merge_cond", cond))
        return _RecordingBuilder(self.log)


def _install_mock_delta(monkeypatch, log):
    fake = types.ModuleType("delta")

    class DeltaTable:
        @staticmethod
        def forPath(spark, path):
            log.append(("for_path", path))
            return _RecordingTable(log)

    fake.DeltaTable = DeltaTable
    monkeypatch.setitem(sys.modules, "delta", fake)


class _AliasableUpdates:
    def alias(self, name):
        return self


def test_merge_dispatch_with_delete_flag(spark, monkeypatch):
    log: list = []
    _install_mock_delta(monkeypatch, log)
    merge_upsert_delta(
        spark,
        "/tmp/fake_delta",
        _AliasableUpdates(),
        keys=["o_orderkey", "o_custkey"],
        delete_col="is_deleted",
    )
    assert ("for_path", "/tmp/fake_delta") in log
    assert (
        "merge_cond",
        "t.o_orderkey = u.o_orderkey AND t.o_custkey = u.o_custkey",
    ) in log
    # merge_upsert contract: delete wins on match, whole-row update
    # otherwise, non-delete unmatched rows insert.
    assert ("matched_delete", "u.is_deleted") in log
    assert ("matched_update_all", "NOT u.is_deleted") in log
    assert ("not_matched_insert_all", "NOT u.is_deleted") in log
    assert log[-1] == ("execute", None)


def test_merge_dispatch_without_delete_flag(spark, monkeypatch):
    log: list = []
    _install_mock_delta(monkeypatch, log)
    merge_upsert_delta(
        spark, "/tmp/fake_delta", _AliasableUpdates(), keys=["doc_id"]
    )
    assert ("merge_cond", "t.doc_id = u.doc_id") in log
    assert ("matched_update_all", None) in log
    assert ("not_matched_insert_all", None) in log
    assert ("matched_delete", "u.is_deleted") not in log


def test_merge_sql_matches_relational_semantics():
    sql = merge_into_sql("base", "cdc", ["k1", "k2"], delete_col="deleted")
    assert "MERGE INTO base t" in sql
    assert "USING cdc u" in sql
    assert "ON t.k1 = u.k1 AND t.k2 = u.k2" in sql
    assert "WHEN MATCHED AND u.deleted THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED AND NOT u.deleted THEN INSERT *" in sql
    plain = merge_into_sql("base", "cdc", ["k"])
    assert "DELETE" not in plain
    assert "WHEN NOT MATCHED THEN INSERT *" in plain


def test_key_condition_quoting_free_identifiers():
    assert merge_key_condition(["a"]) == "t.a = u.a"
    assert merge_key_condition(["a", "b"], "x", "y") == "x.a = y.a AND x.b = y.b"


class _RecordingOptimize:
    def __init__(self, log):
        self.log = log

    def executeZOrderBy(self, *cols):
        self.log.append(("zorder_by", cols))
        return "optimize-result"


def test_optimize_zorder_dispatch(spark, monkeypatch):
    from big_data_bowl_2026_analytics_spark.sources.lakehouse import (
        optimize_zorder_delta,
    )

    log: list = []
    fake = types.ModuleType("delta")

    class DeltaTable:
        @staticmethod
        def forPath(spark, path):
            log.append(("for_path", path))

            class _T:
                def optimize(self):
                    log.append(("optimize", None))
                    return _RecordingOptimize(log)

            return _T()

    fake.DeltaTable = DeltaTable
    monkeypatch.setitem(sys.modules, "delta", fake)
    out = optimize_zorder_delta(spark, "/tmp/t", ["x", "y"])
    assert out == "optimize-result"
    assert ("for_path", "/tmp/t") in log
    assert ("zorder_by", ("x", "y")) in log


def test_write_zordered_auto_falls_back_to_parquet(spark, tmp_path):
    """Without delta the router must produce the engine's own z-order
    layout — verified by reading the files back."""
    from big_data_bowl_2026_analytics_spark.sources.lakehouse import (
        write_zordered_auto,
    )

    df = spark.range(256).selectExpr(
        "id", "cast(id % 16 as double) as x", "cast(id / 16 as double) as y"
    )
    path = str(tmp_path / "zt")
    backend = write_zordered_auto(df, path, "x", "y", n_files=4)
    assert backend == "parquet"
    assert spark.read.parquet(path).count() == 256


def test_write_zordered_auto_routes_to_delta(spark, monkeypatch, tmp_path):
    import big_data_bowl_2026_analytics_spark.sources.lakehouse as lh

    log: list = []
    fake = types.ModuleType("delta")

    class DeltaTable:
        @staticmethod
        def forPath(spark, path):
            log.append(("for_path", path))

            class _T:
                def optimize(self):
                    return _RecordingOptimize(log)

            return _T()

    fake.DeltaTable = DeltaTable
    monkeypatch.setitem(sys.modules, "delta", fake)
    # the delta WRITE would need the JVM extension; capture it instead
    monkeypatch.setattr(
        lh, "write_delta", lambda df, path, mode="overwrite": log.append(("write", path, mode))
    )
    df = spark.range(8).selectExpr("cast(id as double) as x", "cast(id as double) as y")
    backend = lh.write_zordered_auto(df, str(tmp_path / "dt"), "x", "y")
    assert backend == "delta"
    assert log[0][0] == "write"
    assert ("zorder_by", ("x", "y")) in log
