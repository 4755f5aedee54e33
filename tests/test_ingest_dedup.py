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
