"""Incremental ingest-time dedup: batches anti-joined against the
persistent fingerprint index, exactly-once under redelivery."""

import pytest

from sparkcdc.pipeline.ingest_dedup import IncrementalDeduper


@pytest.fixture()
def deduper(spark, tmp_root):
    return IncrementalDeduper.create_or_load(spark, tmp_root, n_buckets=4)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_two_batch_cross_dedup(spark, deduper):
    b1 = _docs(spark, [(0, "alpha"), (1, "beta"), (2, "alpha")])
    fresh1 = deduper.process_batch(b1, batch_id=1)
    got1 = {r.doc_id for r in fresh1.collect()}
    assert got1 == {0, 1}  # intra-batch dup (2 ~ 0) dropped, min id kept

    # batch 2: one cross-batch dup ("beta"), one intra dup, one new
    b2 = _docs(spark, [(10, "beta"), (11, "gamma"), (12, "gamma")])
    fresh2 = deduper.process_batch(b2, batch_id=2)
    assert {r.doc_id for r in fresh2.collect()} == {11}

    idx = {r.fingerprint: r.first_doc_id
           for r in deduper.table.read().collect()}
    assert sorted(idx.values()) == [0, 1, 11]


def test_redelivery_is_fenced(spark, deduper):
    b1 = _docs(spark, [(0, "alpha"), (1, "beta")])
    deduper.process_batch(b1, batch_id=1)
    v_before = deduper.table.manifest().version

    # crash-replay: the same batch redelivered with the same batch_id.
    # dedup_batch now sees its fingerprints in the index -> fresh empty;
    # the index commit is fenced -> version unchanged.
    fresh = deduper.dedup_batch(b1)
    assert fresh.count() == 0
    res = deduper.commit_batch(fresh, batch_id=1)
    assert res.get("skipped") is True
    assert deduper.table.manifest().version == v_before


def test_crash_between_corpus_and_index_commit(spark, tmp_root):
    """Contract probe: corpus written, index commit lost, batch redelivered.
    The fresh set re-derives identically (index lacks it), so the corpus
    sink can fence its duplicate write, and the index commit then lands."""
    d = IncrementalDeduper.create_or_load(spark, tmp_root, n_buckets=4)
    b = _docs(spark, [(0, "alpha"), (1, "beta")])
    fresh_first = sorted(r.doc_id for r in d.dedup_batch(b).collect())
    # (index commit "crashes" here: nothing committed)
    fresh_retry = sorted(r.doc_id for r in d.dedup_batch(b).collect())
    assert fresh_first == fresh_retry == [0, 1]
    d.commit_batch(d.dedup_batch(b), batch_id=1)
    assert d.table.read().count() == 2


def test_resume_across_deduper_instances(spark, tmp_root):
    d1 = IncrementalDeduper.create_or_load(spark, tmp_root)
    d1.process_batch(_docs(spark, [(0, "alpha")]), batch_id=1)

    # new instance over the same root (restart): state persists
    d2 = IncrementalDeduper.create_or_load(spark, tmp_root)
    fresh = d2.process_batch(
        _docs(spark, [(5, "alpha"), (6, "delta")]), batch_id=2
    )
    assert {r.doc_id for r in fresh.collect()} == {6}


def test_streaming_dedup_two_waves(spark, tmp_path):
    """readStream over a growing JSON dir; two availableNow passes. Wave 2
    repeats wave-1 docs plus new ones — only first-seen docs reach the
    corpus, across micro-batches AND across stream restarts."""
    import json
    import os

    from sparkcdc.pipeline.ingest_dedup import start_dedup_stream

    src = tmp_path / "incoming"
    src.mkdir()
    root = str(tmp_path / "lake")

    def run_wave(rows, fname):
        with open(src / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
        )
        q, deduper, corpus = start_dedup_stream(
            spark, stream, root,
            corpus_fields=[("doc_id", "long"), ("text", "string")],
            n_buckets=4, available_now=True,
        )
        q.awaitTermination(120)
        return deduper, corpus

    _, corpus = run_wave(
        [{"doc_id": 0, "text": "alpha"}, {"doc_id": 1, "text": "beta"},
         {"doc_id": 2, "text": "alpha"}],
        "wave1.json",
    )
    got1 = {r.doc_id for r in corpus.read().collect()}
    assert got1 == {0, 1}

    deduper, corpus = run_wave(
        [{"doc_id": 10, "text": "beta"}, {"doc_id": 11, "text": "gamma"}],
        "wave2.json",
    )
    got2 = {r.doc_id for r in corpus.read().collect()}
    assert got2 == {0, 1, 11}
    assert deduper.table.read().count() == 3


def test_process_batch_sink_runs_before_index_commit(spark, tmp_root):
    d = IncrementalDeduper.create_or_load(spark, tmp_root, n_buckets=4)
    order = []

    def sink(fresh):
        # at sink time the index must NOT yet contain this batch
        order.append(("sink", d.table.read().count()))

    d.process_batch(_docs(spark, [(0, "alpha")]), batch_id=1, sink=sink)
    order.append(("after", d.table.read().count()))
    assert order == [("sink", 0), ("after", 1)]


# ---------------------------------------------------------------------------
# IncrementalNearDeduper (MinHash/LSH band index)
# ---------------------------------------------------------------------------


def _near(spark, tmp_root, **kw):
    from sparkcdc.pipeline.ingest_dedup import IncrementalNearDeduper

    return IncrementalNearDeduper.create_or_load(
        spark, tmp_root, n_buckets=4, **kw
    )


def _band_map(docs_df, deduper):
    """{doc_id: set-of-(band, band_sig)} via the shared doc_bands keys."""
    rows = deduper._bands(docs_df, "text", "doc_id").collect()
    out = {}
    for r in rows:
        out.setdefault(r.doc, set()).add((r.band, r.band_sig))
    return out


def _expected_keep(band_map, committed_bands, intra):
    """Python reference for one batch: drop docs colliding with committed
    bands, then resolve intra-batch per the chosen mode."""
    surv = {
        d: bs for d, bs in band_map.items()
        if not (bs & committed_bands)
    }
    if intra == "per_band_min":
        keep = set()
        for d, bs in surv.items():
            if all(
                d == min(x for x, xb in surv.items() if b in xb)
                for b in bs
            ):
                keep.add(d)
        return keep
    # clusters: connected components of the band-collision graph, keep min
    parent = {d: d for d in surv}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = list(surv)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if surv[a] & surv[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for d in surv:
        comps.setdefault(find(d), set()).add(d)
    return {min(c) for c in comps.values()}


def test_near_identical_cross_batch(spark, tmp_root):
    d = _near(spark, tmp_root)
    long = "the quick brown fox jumps over the lazy dog again and again"
    b1 = _docs(spark, [(0, long), (1, "completely different words here now")])
    fresh1 = d.process_batch(b1, batch_id=1)
    assert {r.doc_id for r in fresh1.collect()} == {0, 1}

    # identical text shares every band -> dropped; novel text admitted
    b2 = _docs(spark, [(10, long), (11, "nothing like either of those two")])
    fresh2 = d.process_batch(b2, batch_id=2)
    assert {r.doc_id for r in fresh2.collect()} == {11}
    # index holds one row per (band, band_sig) of the three admitted docs
    idx = d.table.read().collect()
    assert {r.first_doc_id for r in idx} == {0, 1, 11}


@pytest.mark.parametrize("intra", ["per_band_min", "clusters"])
def test_near_dedup_matches_python_reference(spark, tmp_root, intra):
    """Two batches of overlapping templated docs; the Spark keep-set must
    equal a python reference computed from the same band keys, in both
    intra-batch modes."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()

    def text(i):
        # rotate + perturb so some docs share most shingles, others none
        rot = words[i % 4:] + words[:i % 4]
        if i % 3 == 0:
            rot[5] = f"tok{i}"
        return " ".join(rot)

    rows1 = [(i, text(i)) for i in range(12)]
    rows2 = [(100 + i, text(i + 2)) for i in range(12)]
    d = _near(spark, tmp_root)

    b1 = _docs(spark, rows1)
    bm1 = _band_map(b1, d)
    exp1 = _expected_keep(bm1, set(), intra)
    got1 = {r.doc_id for r in
            d.process_batch(b1, batch_id=1, intra=intra).collect()}
    assert got1 == exp1

    committed = set().union(*(bm1[k] for k in exp1))
    b2 = _docs(spark, rows2)
    bm2 = _band_map(b2, d)
    exp2 = _expected_keep(bm2, committed, intra)
    got2 = {r.doc_id for r in
            d.process_batch(b2, batch_id=2, intra=intra).collect()}
    assert got2 == exp2


def test_near_short_docs_always_admitted(spark, tmp_root):
    """Docs with fewer tokens than the shingle width have no bands: they
    cannot collide, so they are admitted (empty band set) rather than
    silently dropped by the keep-join."""
    d = _near(spark, tmp_root)
    b = _docs(spark, [(0, "hi"), (1, "two tokens"),
                      (2, "a full length document body here")])
    fresh = d.process_batch(b, batch_id=1)
    rows = {r.doc_id: r.bands for r in fresh.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0] == [] and rows[1] == [] and len(rows[2]) == 4
    # short docs never pollute the index
    assert d.table.read().count() == 4


def test_bucket_pruned_probe_equals_full_read(spark, tmp_path):
    """The bucket-pruned index probe (default) must admit exactly the
    same docs as the full-index read, for both dedupers."""
    texts = [
        (i, f"document number {i % 7} with shared body text repeated")
        for i in range(20)
    ]
    b1 = _docs(spark, texts[:10])
    b2 = _docs(spark, texts[10:])

    exact_p = IncrementalDeduper.create_or_load(
        spark, str(tmp_path / "p"), n_buckets=8)
    exact_f = IncrementalDeduper.create_or_load(
        spark, str(tmp_path / "f"), n_buckets=8)
    exact_p.process_batch(b1, batch_id=1)
    exact_f.commit_batch(
        exact_f.dedup_batch(b1, bucket_pruned=False).localCheckpoint(),
        batch_id=1)
    got_p = {r.doc_id for r in exact_p.dedup_batch(b2).collect()}
    got_f = {r.doc_id
             for r in exact_f.dedup_batch(b2, bucket_pruned=False).collect()}
    assert got_p == got_f

    near_p = _near(spark, str(tmp_path / "np"))
    near_f = _near(spark, str(tmp_path / "nf"))
    near_p.process_batch(b1, batch_id=1)
    near_f.commit_batch(
        near_f.dedup_batch(b1, bucket_pruned=False).localCheckpoint(),
        batch_id=1)
    ngot_p = {r.doc_id for r in near_p.dedup_batch(b2).collect()}
    ngot_f = {r.doc_id
              for r in near_f.dedup_batch(b2, bucket_pruned=False).collect()}
    assert ngot_p == ngot_f


def test_near_dedup_property_random_corpora(spark, tmp_path):
    """Hypothesis: for arbitrary tiny corpora over a small vocabulary
    (high collision rate by construction), the two-batch incremental
    keep-set equals the python reference computed from the same band
    keys — shrinkage finds edge topologies (chains, cliques, repeated
    docs) the structured test misses."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    doc = st.lists(st.sampled_from(vocab), min_size=3, max_size=7).map(
        " ".join
    )
    corpus = st.lists(doc, min_size=1, max_size=8)

    counter = [0]

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts1=corpus, texts2=corpus)
    def run(texts1, texts2):
        counter[0] += 1
        root = str(tmp_path / f"ex{counter[0]}")
        d = _near(spark, root)
        b1 = _docs(spark, list(enumerate(texts1)))
        b2 = _docs(spark, [(100 + i, t) for i, t in enumerate(texts2)])

        bm1 = _band_map(b1, d)
        exp1 = _expected_keep(bm1, set(), "per_band_min")
        got1 = {r.doc_id for r in d.process_batch(b1, batch_id=1).collect()}
        assert got1 == exp1

        committed = set().union(*(bm1[k] for k in exp1)) if exp1 else set()
        bm2 = _band_map(b2, d)
        exp2 = _expected_keep(bm2, committed, "per_band_min")
        got2 = {r.doc_id for r in d.process_batch(b2, batch_id=2).collect()}
        assert got2 == exp2

    run()


def test_near_redelivery_is_fenced(spark, tmp_root):
    d = _near(spark, tmp_root)
    b1 = _docs(spark, [(0, "some document body"), (1, "another document body")])
    d.process_batch(b1, batch_id=1)
    v_before = d.table.manifest().version

    fresh = d.dedup_batch(b1)
    assert fresh.count() == 0
    res = d.commit_batch(fresh, batch_id=1)
    assert res.get("skipped") is True
    assert d.table.manifest().version == v_before


def test_near_resume_across_instances(spark, tmp_root):
    d1 = _near(spark, tmp_root)
    d1.process_batch(_docs(spark, [(0, "shared corpus text")]), batch_id=1)

    d2 = _near(spark, tmp_root)
    fresh = d2.process_batch(
        _docs(spark, [(5, "shared corpus text"), (6, "a brand new doc")]),
        batch_id=2,
    )
    assert {r.doc_id for r in fresh.collect()} == {6}


def test_streaming_near_dedup(spark, tmp_path):
    import json

    from sparkcdc.pipeline.ingest_dedup import start_dedup_stream

    src = tmp_path / "incoming"
    src.mkdir()
    root = str(tmp_path / "lake")

    def run_wave(rows, fname):
        with open(src / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
        )
        q, deduper, corpus = start_dedup_stream(
            spark, stream, root,
            corpus_fields=[("doc_id", "long"), ("text", "string")],
            n_buckets=4, available_now=True, method="minhash",
        )
        q.awaitTermination(120)
        return corpus

    t = "one long body of text that minhashes stably across the waves"
    corpus = run_wave(
        [{"doc_id": 0, "text": t}, {"doc_id": 1, "text": t}],
        "wave1.json",
    )
    assert {r.doc_id for r in corpus.read().collect()} == {0}

    corpus = run_wave(
        [{"doc_id": 10, "text": t},
         {"doc_id": 11, "text": "entirely new material in wave two"}],
        "wave2.json",
    )
    assert {r.doc_id for r in corpus.read().collect()} == {0, 11}


def test_string_id_index_table(spark, tmp_root):
    from sparkcdc.lake import LakeTable
    from sparkcdc.pipeline.ingest_dedup import IncrementalDeduper

    t = LakeTable.create(
        spark, tmp_root, "fps",
        fields=[("fingerprint", "string"), ("first_uri", "string")],
        key_cols=["fingerprint"], n_buckets=4,
    )
    d = IncrementalDeduper(t)
    docs = spark.createDataFrame(
        [("u://a", "alpha"), ("u://b", "alpha")], "uri string, text string"
    )
    d.process_batch(docs, batch_id=1, id_col="uri")
    idx = {r.first_uri for r in t.read().collect()}
    assert idx == {"u://a"}  # string id preserved, not NULLed by a cast
