"""Property-style randomized replay (SURVEY §5): random op sequences with a
seed → engine final state must equal the sequential per-key pandas oracle,
including restart-at-random-offset resume."""

import random
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcdc.engine import CdcEngine, EngineConfig
from sparkcdc.envelope import envelope_schema, transaction_struct
from sparkcdc.lake import LakeTable

ROW_FIELDS = [
    ("repo", T.StringType()),
    ("path", T.StringType()),
    ("commit", T.StringType()),
    ("lang", T.StringType()),
    ("content", T.StringType()),
]


def random_events(seed: int, n: int, n_keys: int):
    """Python-side random envelope rows (op weights incl. tombstones)."""
    rng = random.Random(seed)
    rows = []
    for off in range(n):
        k = rng.randrange(n_keys)
        repo, path = f"r-{k % 7}", f"p-{k}.py"
        op = rng.choices(["c", "u", "d", "m"], weights=[30, 50, 15, 5])[0]
        content = f"s{seed}:k{k}:o{off}"
        row = (repo, path, f"c{off:08d}", "py", content)
        before = (repo, path, None, None, None) if op in ("u", "d") else None
        after = row if op != "d" else None
        rows.append((op, 1_700_000_000_000 + off, before, after,
                     None, None, k % 4, off, False))
        if op == "d" and rng.random() < 0.5:  # tombstone follows some deletes
            rows.append(("d", 1_700_000_000_000 + off, None, None,
                         None, None, k % 4, off, True))
    return rows


def oracle_state(rows):
    state = {}
    for op, _ts, before, after, _s, _t, _p, _off, tomb in rows:
        if tomb or op == "m":
            continue
        if op == "d":
            state.pop((before[0], before[1]), None)
        else:
            state[(after[0], after[1])] = after
    return state


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_random_sequence_matches_oracle(spark, tmp_root, seed):
    n, n_keys = 400, 60
    rows = random_events(seed, n, n_keys)
    env = spark.createDataFrame(rows, envelope_schema(ROW_FIELDS))
    table = LakeTable.create(
        spark, tmp_root, f"t{seed}",
        fields=[(c, "string") for c, _ in ROW_FIELDS],
        key_cols=["repo", "path"], n_buckets=4,
    )
    eng = CdcEngine(spark, table, EngineConfig(batch_size=97, n_keys=n_keys))
    # replay in uneven batches sliced by offset (mirrors the offset contract)
    eng.replay(
        n, envelopes_for=lambda lo, hi: env.filter(
            (F.col("offset") >= lo) & (F.col("offset") < hi))
    )
    want = {k: v[4] for k, v in oracle_state(rows).items()}
    got = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    assert got == want


def test_random_sequence_with_midpoint_restart(spark, tmp_root):
    seed, n, n_keys = 99, 300, 40
    rows = random_events(seed, n, n_keys)
    env = spark.createDataFrame(rows, envelope_schema(ROW_FIELDS))
    mk = lambda: CdcEngine(  # noqa: E731
        spark,
        LakeTable.load(spark, tmp_root, "t"),
        EngineConfig(batch_size=50, n_keys=n_keys),
    )
    LakeTable.create(
        spark, tmp_root, "t", fields=[(c, "string") for c, _ in ROW_FIELDS],
        key_cols=["repo", "path"], n_buckets=4,
    )
    feed = lambda lo, hi: env.filter(  # noqa: E731
        (F.col("offset") >= lo) & (F.col("offset") < hi))
    eng = mk()
    eng.replay(137, envelopes_for=feed)   # "crash" partway (odd boundary)
    eng2 = mk()                           # fresh engine = restart
    assert eng2.committed_offset() == 137
    eng2.replay(n, envelopes_for=feed)
    want = {k: v[4] for k, v in oracle_state(rows).items()}
    got = {(r["repo"], r["path"]): r["content"]
           for r in eng2.table.read().collect()}
    assert got == want


def test_change_feed_semantics(spark):
    """change_feed diffs LWW states at two offsets: churn collapses,
    create+delete inside the window is invisible, deletes carry the
    before-image."""
    from sparkcdc.apply import change_feed

    rows = [
        # (user_id, event_type, value, props, _op, part_id, offset)
        (1, "signup", 1.0, "a", "u", 0, 1),    # live at lo
        (1, "click", 2.0, "b", "u", 0, 60),    # updated in window -> u
        (2, "signup", 1.0, "x", "u", 0, 2),    # live at lo
        (2, None, None, None, "d", 0, 70),     # deleted in window -> d
        (3, "signup", 9.0, "n", "u", 0, 55),   # created in window -> c
        (4, "signup", 5.0, "t", "u", 0, 52),   # created AND deleted
        (4, None, None, None, "d", 0, 58),     #   inside window -> nothing
        (5, "signup", 3.0, "s", "u", 0, 3),    # untouched -> nothing
        (5, "click", 4.0, "s2", "u", 0, 40),   # (last change before lo)
        (6, "signup", 7.0, "q", "u", 0, 61),   # created, churned 3x -> one c
        (6, "click", 7.5, "q2", "u", 0, 62),
        (6, "view", 7.9, "q3", "u", 0, 63),
    ]
    ch = spark.createDataFrame(
        rows,
        "user_id long, event_type string, value double, props string,"
        "_op string, part_id int, offset long",
    )
    out = {
        r.user_id: r
        for r in change_feed(ch, ["user_id"], lo=50, hi=100).collect()
    }
    assert set(out) == {1, 2, 3, 6}
    assert out[1]._change_op == "u" and out[1].props == "b"
    assert out[2]._change_op == "d" and out[2].props == "x"  # before-image
    assert out[3]._change_op == "c"
    assert out[6]._change_op == "c" and out[6].props == "q3"  # final image

    # identity window -> empty feed
    assert change_feed(ch, ["user_id"], lo=100, hi=100).count() == 0
