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


def test_model_based_interleaving(spark, wd):
    """Model-based check: a long interleaved sequence of init / merge /
    upsert / compact / clear must resolve exactly to a Python-dict model
    applying the same semantics (latest-wins per column, merge ignores
    unknown keys, upsert inserts with '' defaults, clear resets, compact
    is a no-op on state)."""
    model: dict[str, list[str]] = {}

    def m_init(ids):
        model.clear()
        for i in ids:
            model[f"u{i}"] = ["", "", ""]

    def m_set(ids, col, val, insert):
        ci = ("copied", "processed", "uploaded").index(col)
        for i in ids:
            k = f"u{i}"
            if k in model:
                model[k][ci] = val
            elif insert:
                row = ["", "", ""]
                row[ci] = val
                model[k] = row

    def m_clear():
        for k in model:
            model[k] = ["", "", ""]

    ops = [
        ("init", range(20)),
        ("merge", range(5), "processed", "yes"),
        ("upsert", range(18, 25), "copied", "yes"),
        ("merge", range(30, 35), "uploaded", "no"),   # all unknown: no-op
        ("merge", range(3, 8), "processed", "no"),    # overwrites 3,4
        ("compact",),
        ("upsert", range(22, 28), "processed", "yes"),
        ("merge", range(20, 30), "uploaded", "yes"),  # known: 18..27 subset
        ("clear",),
        ("upsert", range(2), "copied", "no"),
        ("merge", range(1, 3), "processed", "yes"),
    ]
    for n, op in enumerate(ops):
        if op[0] == "init":
            L.init_ledger(spark, wd, _keys(spark, op[1]))
            m_init(op[1])
        elif op[0] == "merge":
            L.merge_status(spark, wd, _keys(spark, op[1]), op[2], op[3],
                           f"r{n}")
            m_set(op[1], op[2], op[3], insert=False)
        elif op[0] == "upsert":
            L.upsert_status(spark, wd, _keys(spark, op[1]), op[2], op[3],
                            f"r{n}")
            m_set(op[1], op[2], op[3], insert=True)
        elif op[0] == "compact":
            L.compact(spark, wd)
        elif op[0] == "clear":
            L.clear_statuses(spark, wd)
            m_clear()
    assert _state(spark, wd) == {k: tuple(v) for k, v in model.items()}


def test_retryall_clears_statuses(spark, wd):
    L.init_ledger(spark, wd, _keys(spark, range(10)))
    L.upsert_status(spark, wd, _keys(spark, range(10)), "processed",
                    L.YES, "r1")
    L.clear_statuses(spark, wd)
    st = _state(spark, wd)
    assert all(v == ("", "", "") for v in st.values())
    assert _n_delta_dirs(wd) == 0


def test_compaction_spares_deltas_committed_mid_fold(spark, wd, monkeypatch):
    """Compaction pins the delta set it resolved BEFORE folding; a commit
    landing between the resolve and the drop must survive in the log and
    stay visible to readers (the lost-delta race from ADVICE r02)."""
    L.init_ledger(spark, wd, _keys(spark, range(10)))
    L.merge_status(spark, wd, _keys(spark, range(5)), "processed",
                   L.YES, "r1")
    real = L._atomic_overwrite

    def overwrite_then_commit_late(df, path):
        real(df, path)
        L._commit_delta(wd, L._delta_rows(_keys(spark, [7]), "uploaded",
                                          L.NO, "late", False))

    monkeypatch.setattr(L, "_atomic_overwrite", overwrite_then_commit_late)
    L.compact(spark, wd)
    monkeypatch.undo()
    assert _n_delta_dirs(wd) == 1  # only the late commit remains
    st = _state(spark, wd)
    assert st["u7"] == ("", "", "no")  # late delta visible, not lost
    assert st["u3"] == ("", "yes", "")  # folded state intact
