"""apply_changes — relational MERGE / last-writer-wins CDC apply
(data_management.py; the table-level twin of the index CDC drain)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_apply_changes_insert_update_delete(spark):
    from neurondb_spark.data_management import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "u", "B"), (3, "d", None), (4, "i", "d")],
        "id long, op string, v string",
    )
    out = apply_changes(base, changes, ["id"])
    assert _rows(out) == [(1, "a"), (2, "B"), (4, "d")]


def test_apply_changes_seq_last_writer_wins(spark):
    from neurondb_spark.data_management import apply_changes

    base = spark.createDataFrame([(1, "a")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, "u", "x", 10), (1, "u", "y", 20), (1, "d", None, 5),
         (2, "i", "new", 1), (2, "d", None, 2)],
        "id long, op string, v string, seq long",
    )
    out = apply_changes(base, changes, ["id"], seq_col="seq")
    # id=1: seq 20 ('u','y') wins; id=2: seq 2 delete wins over insert
    assert _rows(out) == [(1, "y")]


def test_apply_changes_idempotent_replay(spark):
    """Replaying the same change batch over its own result is a no-op —
    the property that makes at-least-once CDC delivery safe."""
    from neurondb_spark.data_management import apply_changes

    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, "u", "A"), (3, "i", "c")], "id long, op string, v string"
    )
    once = apply_changes(base, changes, ["id"])
    twice = apply_changes(once, changes, ["id"])
    assert _rows(once) == _rows(twice)


def test_apply_changes_contracts(spark):
    from neurondb_spark.data_management import apply_changes

    base = spark.createDataFrame([(1, "a")], "id long, v string")
    dup = spark.createDataFrame(
        [(1, "u", "x"), (1, "u", "y")], "id long, op string, v string"
    )
    with pytest.raises(ValueError, match="seq_col"):
        apply_changes(base, dup, ["id"]).collect()
    bad = spark.createDataFrame([(1, "z", "x")], "id long, op string, v string")
    with pytest.raises(ValueError, match="'i'/'u'/'d'"):
        apply_changes(base, bad, ["id"]).collect()
    missing = spark.createDataFrame([(1, "x")], "id long, v string")
    with pytest.raises(ValueError, match="missing column"):
        apply_changes(base, missing, ["id"])


def test_apply_changes_seq_tie_deterministic(spark):
    """Ties on seq break on a stable hash of op+payload (ADVICE r12):
    the winner is the same row on every evaluation and replay, honoring
    the docstring's determinism/idempotency claims."""
    from neurondb_spark.data_management import apply_changes

    base = spark.createDataFrame([(1, "a")], "id long, v string")
    tied = spark.createDataFrame(
        [(1, "u", "x", 7), (1, "u", "y", 7), (1, "u", "older", 3)],
        "id long, op string, v string, seq long",
    )
    winners = {
        tuple(sorted(tuple(r) for r in
                     apply_changes(base, tied, ["id"], seq_col="seq")
                     .collect()))
        for _ in range(3)
    }
    assert len(winners) == 1
    ((row,),) = winners
    assert row[0] == 1 and row[1] in ("x", "y")  # a max-seq row, stably
    # replay over own result converges (idempotency with the tie present)
    once = apply_changes(base, tied, ["id"], seq_col="seq")
    twice = apply_changes(once, tied, ["id"], seq_col="seq")
    assert _rows(once) == _rows(twice)
