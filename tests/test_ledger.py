"""Merge-on-read ledger semantics: O(batch) delta commits, latest-wins
resolution, crash isolation, compaction equivalence (the local analog of
Iceberg MERGE INTO + snapshot expiry)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from optimizerasters_spark import ledger as L


@pytest.fixture()
def wd(tmp_path):
    return str(tmp_path / "job")


def _keys(spark, ids):
    return spark.createDataFrame([(f"u{i}",) for i in ids], "url string")


def _state(spark, wd):
    return {r["url"]: (r["copied"], r["processed"], r["uploaded"])
            for r in L.read_ledger(spark, wd).collect()}


def _current(wd):
    with open(os.path.join(L.ledger_path(wd), "CURRENT")) as f:
        return f.read().strip()


def _n_delta_dirs(wd):
    root = os.path.join(L.ledger_path(wd), "delta")
    if not os.path.isdir(root):
        return 0
    return len([n for n in os.listdir(root) if n.startswith("d-")])


def test_merge_is_o_batch_append_not_base_rewrite(spark, wd):
    """A status flip must append ONE delta commit and leave the base
    snapshot untouched — the round-1 O(ledger) rewrite is retired."""
    L.init_ledger(spark, wd, _keys(spark, range(100)))
    base_before = _current(wd)
    L.merge_status(spark, wd, _keys(spark, range(10)), "processed",
                   L.YES, "r1")
    assert _current(wd) == base_before  # base never rewritten
    assert _n_delta_dirs(wd) == 1
    st = _state(spark, wd)
    assert st["u5"][1] == "yes" and st["u50"][1] == ""


def test_merge_ignores_unknown_keys(spark, wd):
    L.init_ledger(spark, wd, _keys(spark, range(10)))
    L.merge_status(spark, wd, _keys(spark, range(8, 15)), "processed",
                   L.YES, "r1")
    st = _state(spark, wd)
    assert set(st) == {f"u{i}" for i in range(10)}
    assert st["u8"][1] == "yes" and st["u9"][1] == "yes"


def test_upsert_inserts_unknown_keys(spark, wd):
    L.init_ledger(spark, wd, _keys(spark, range(10)))
    L.upsert_status(spark, wd, _keys(spark, range(8, 15)), "processed",
                    L.YES, "r1")
    st = _state(spark, wd)
    assert set(st) == {f"u{i}" for i in range(15)}
    assert st["u12"] == ("", "yes", "")


def test_latest_wins_per_column(spark, wd):
    L.init_ledger(spark, wd, _keys(spark, range(5)))
    L.merge_status(spark, wd, _keys(spark, [1]), "processed", L.YES, "r1")
    L.merge_status(spark, wd, _keys(spark, [1]), "processed", L.NO, "r2")
    L.merge_status(spark, wd, _keys(spark, [1]), "copied", L.YES, "r3")
    st = _state(spark, wd)
    assert st["u1"] == ("yes", "no", "")
    run = {r["url"]: r["updated_run"]
           for r in L.read_ledger(spark, wd).collect()}
    assert run["u1"] == "r3"  # last delta to touch the key
    assert run["u2"] == "init"


def test_uncommitted_delta_is_invisible_and_vacuumed(spark, wd):
    """Crash between delta write and marker flip: the directory exists
    but no reader sees it; vacuum() reclaims it."""
    L.init_ledger(spark, wd, _keys(spark, range(5)))
    root = os.path.join(L.ledger_path(wd), "delta")
    os.makedirs(root, exist_ok=True)
    torn = os.path.join(root, "d-00000099-deadbeef")
    _keys(spark, [0]).withColumn("col", F.lit("processed")) \
        .withColumn("value", F.lit("yes")) \
        .withColumn("run_id", F.lit("torn")) \
        .withColumn("seq", F.lit(99).cast("bigint")) \
        .withColumn("is_upsert", F.lit(False)) \
        .write.mode("overwrite").parquet(torn)  # no _COMMITTED marker
    st = _state(spark, wd)
    assert st["u0"][1] == ""  # torn commit invisible
    assert L.vacuum(wd) >= 1
    assert not os.path.isdir(torn)


def test_compaction_preserves_state_and_clears_log(spark, wd):
    L.init_ledger(spark, wd, _keys(spark, range(50)))
    L.merge_status(spark, wd, _keys(spark, range(20)), "processed",
                   L.YES, "r1")
    L.upsert_status(spark, wd, _keys(spark, range(45, 60)), "copied",
                    L.YES, "r2")
    L.merge_status(spark, wd, _keys(spark, range(5)), "uploaded",
                   L.NO, "r3")
    before = _state(spark, wd)
    base_before = _current(wd)
    L.compact(spark, wd)
    assert _current(wd) != base_before
    assert _n_delta_dirs(wd) == 0
    assert _state(spark, wd) == before


def test_auto_compaction_bounds_the_log(spark, wd, monkeypatch):
    monkeypatch.setattr(L, "COMPACT_AFTER", 3)
    L.init_ledger(spark, wd, _keys(spark, range(10)))
    for i in range(5):
        L.merge_status(spark, wd, _keys(spark, [i]), "processed",
                       L.YES, f"r{i}")
    assert _n_delta_dirs(wd) <= 3
    st = _state(spark, wd)
    assert all(st[f"u{i}"][1] == "yes" for i in range(5))


def test_retryall_clears_statuses(spark, wd):
    L.init_ledger(spark, wd, _keys(spark, range(10)))
    L.upsert_status(spark, wd, _keys(spark, range(10)), "processed",
                    L.YES, "r1")
    L.clear_statuses(spark, wd)
    st = _state(spark, wd)
    assert all(v == ("", "", "") for v in st.values())
    assert _n_delta_dirs(wd) == 0
