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
