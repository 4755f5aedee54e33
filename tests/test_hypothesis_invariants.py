"""Hypothesis property tests: engine invariants over arbitrary event
multisets (driver-side generated, tiny examples — shrinkage matters more
than volume here; the big randomized suites live in test_property_replay).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkcdc import apply as apply_mod
from sparkcdc.envelope import envelope_schema
from pyspark.sql import types as T

ROW_FIELDS = [("repo", T.StringType()), ("path", T.StringType()),
              ("commit", T.StringType()), ("lang", T.StringType()),
              ("content", T.StringType())]

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a")]

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.sampled_from(KEYS),
        st.text(alphabet="xyz", min_size=0, max_size=5),
    ),
    min_size=1,
    max_size=12,
)


def to_envelopes(spark, events):
    rows = []
    for off, (op, (repo, path), content) in enumerate(events):
        row = (repo, path, "c0", "py", content)
        before = (repo, path, None, None, None) if op in ("u", "d") else None
        after = row if op != "d" else None
        rows.append((op, off, before, after, None, None, 0, off, False))
    return spark.createDataFrame(rows, envelope_schema(ROW_FIELDS))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy)
def test_lww_reduce_invariants(spark, events):
    env = to_envelopes(spark, events)
    red = apply_mod.reduce_envelopes(
        env, [n for n, _ in ROW_FIELDS], ["repo", "path"]
    ).collect()
    # one row per distinct key seen
    seen_keys = {tuple(k) for _op, k, _c in events}
    assert len(red) == len({(r["repo"], r["path"]) for r in red})
    assert {(r["repo"], r["path"]) for r in red} == seen_keys
    # winner is the LAST event per key, with matching op class and content
    last = {}
    for op, k, content in events:
        last[k] = (op, content)
    for r in red:
        op, content = last[(r["repo"], r["path"])]
        assert r["_op"] == ("d" if op == "d" else "u")
        if op != "d":
            assert r["content"] == content


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=events_strategy)
def test_extract_rewrite_preserves_cardinality(spark, events):
    from sparkcdc.transforms import extract_new_record_state

    env = to_envelopes(spark, events)
    flat = extract_new_record_state("rewrite")(env).collect()
    assert len(flat) == len(events)
    n_del = sum(1 for op, _k, _c in events if op == "d")
    assert sum(1 for r in flat if r["__deleted"] == "true") == n_del


# -- sink differential: MemoryTableSink vs LakeTable ---------------------------

sink_ops_strategy = st.lists(
    st.one_of(
        # a merge batch: per-key op + content
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.sampled_from(["u", "d"]),
                      st.text(alphabet="ab", min_size=0, max_size=3)),
            min_size=1, max_size=4, unique_by=lambda t: t[0],
        ),
        # a schema evolution step
        st.sampled_from(["add", "widen"]),
    ),
    min_size=1, max_size=6,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=sink_ops_strategy)
def test_sink_differential_memory_vs_lake(spark, tmp_path_factory, ops):
    """Differential property: the SAME op sequence (merges with mixed
    upsert/delete, interleaved schema evolutions, a fenced redelivery)
    through both TableSink implementations yields identical final state,
    version-for-version fences, and epochs — MemoryTableSink is the
    executable spec LakeTable must agree with."""
    import os

    from sparkcdc.lake import LakeTable
    from sparkcdc.sink import MemoryTableSink

    root = str(tmp_path_factory.mktemp("diff"))
    fields = [(n, "string") for n, _ in ROW_FIELDS]
    lake = LakeTable.create(spark, root, "l", fields, ["repo", "path"],
                            n_buckets=2)
    mem = MemoryTableSink(spark, "m", fields, ["repo", "path"],
                          meta_dir=os.path.join(root, "meta"), n_buckets=2)
    added = 0
    bid = 0
    names = [n for n, _ in fields]
    for step in ops:
        if step == "add":
            added += 1
            ch = [{"action": "add", "name": f"x{added}", "type": "string",
                   "default": "dflt"}]
            lake.evolve(ch); mem.evolve(ch)
            names.append(f"x{added}")
            continue
        if step == "widen":
            continue  # string fields: nothing legal to widen; keep shape
        rows = [
            (k[0], k[1], "c0", "py", content,
             *(["v"] * added), op)
            for k, op, content in step
        ]
        batch = spark.createDataFrame(rows, names + ["_op"])
        r1 = lake.merge(batch, batch_id=bid)
        r2 = mem.merge(batch, batch_id=bid)
        assert r1["skipped"] == r2["skipped"] is False
        # fenced redelivery must be a no-op on BOTH
        assert lake.merge(batch, batch_id=bid)["skipped"]
        assert mem.merge(batch, batch_id=bid)["skipped"]
        bid += 1
    proj = lambda t: sorted(  # noqa: E731
        tuple(r) for r in t.read().select(*names).collect())
    assert proj(lake) == proj(mem)
    assert lake.manifest().epoch == mem.manifest().epoch
    assert (lake.manifest().summary.get("last_batch", {})
            == mem.manifest().summary.get("last_batch", {}))


# ---------------------------------------------------------------------------
# Round-4c operators vs pure-python references
# ---------------------------------------------------------------------------


docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
             min_size=0, max_size=4),  # doc = list of lines
    min_size=1, max_size=6,
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs_strategy)
def test_dedup_lines_matches_python_reference(spark, docs):
    from sparkcdc.pipeline.dedup import dedup_lines


    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
           for r in dedup_lines(df).collect()}

    # python reference: a line is removed iff >= 2 distinct docs carry it
    # (split of "" yields one empty line, mirroring F.split)
    split = {i: ("\n".join(lines)).split("\n") for i, lines in enumerate(docs)}
    from collections import defaultdict
    docs_of = defaultdict(set)
    for i, ls in split.items():
        for l in ls:
            docs_of[l].add(i)
    dup = {l for l, d in docs_of.items() if len(d) >= 2}
    for i, ls in split.items():
        kept = [l for l in ls if l not in dup]
        want = ("\n".join(kept), len(kept), len(ls) - len(kept))
        assert got[i] == want, (i, got[i], want)


patch_stream_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=1, max_value=3),          # key
        st.sampled_from(["x", "y"]),                    # field touched
        st.integers(min_value=0, max_value=9),          # value
        st.booleans(),                                  # update removes?
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(patch_stream_strategy)
def test_document_fold_matches_python_reference(spark, events):
    import json

    from sparkcdc.transforms.document import reduce_document_patches
    from pyspark.sql import types as T


    fields = [("k", T.LongType()), ("x", T.StringType()),
              ("y", T.StringType())]
    lines = []
    for off, (op, key, field, val, rem) in enumerate(events):
        doc = {
            "_id": {"_data": f"{off:x}"},
            "operationType": op,
            "clusterTime": {"$timestamp": {"t": 100, "i": off}},
            "ns": {"db": "d", "coll": "c"},
            "documentKey": {"_id": key},
        }
        if op == "insert":
            doc["fullDocument"] = {"k": key, "x": str(val), "y": str(val)}
        elif op == "update":
            doc["updateDescription"] = (
                {"updatedFields": {}, "removedFields": [field]} if rem
                else {"updatedFields": {field: str(val)},
                      "removedFields": []}
            )
        lines.append(json.dumps(doc))
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    got = {r.k: (r.x, r.y)
           for r in reduce_document_patches(df, fields, "k").collect()}

    # python reference: sequential apply (order = offset order)
    state: dict[int, dict | None] = {}
    for op, key, field, val, rem in events:
        if op == "insert":
            state[key] = {"x": str(val), "y": str(val)}
        elif op == "delete":
            state[key] = None
        elif state.get(key) is not None:
            if rem:
                state[key].pop(field, None)
            else:
                state[key][field] = str(val)
    want = {k: (v.get("x"), v.get("y"))
            for k, v in state.items() if v is not None}
    assert got == want, (got, want)


# -- properties text format: serialize -> parse round trip ----------------------

#: characters exercising every escape class: separators, comment leaders,
#: backslash, whitespace, unicode, and the '\\'+'uXXXX' adjacency corner
_PROP_CHARS = st.text(
    alphabet=st.sampled_from(
        list("abzAZ09_.-:=# !\\\tééu4071f") + ["\n"]
    ),
    max_size=12,
)


def _java_escape_key(k: str) -> str:
    out = []
    for ch in k:
        if ch in "=:# !\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out)


def _java_escape_val(v: str) -> str:
    # saveConvert escapes separators and comment leaders in VALUES too
    # ('a=b' stores as 'a\=b') — real Java-written files carry these
    out = []
    for i, ch in enumerate(v):
        if ch in "=:#!\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch == " " and i == 0:
            out.append("\\ ")  # leading space must be escaped
        else:
            out.append(ch)
    return "".join(out)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(
    _PROP_CHARS.filter(lambda k: k != ""), _PROP_CHARS, max_size=6))
def test_properties_roundtrip_store_then_load(pairs):
    """Any map serialized with java.util.Properties store() escaping
    parses back identically — the exact porting contract: what a Java
    deployment wrote, this parser reads."""
    from sparkcdc.properties import parse_properties

    text = "".join(
        f"{_java_escape_key(k)}={_java_escape_val(v)}\n"
        for k, v in pairs.items()
    )
    assert parse_properties(text) == pairs
