"""Corpus-curation operators: decontamination, repetition stats,
deterministic stratified sampling, mixture planning
(sparkcdc/pipeline/curation.py)."""

import pytest
from pyspark.sql import functions as F

from sparkcdc.pipeline import curation as cu


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


# -- ngram contamination --------------------------------------------------


def test_contamination_flags_overlapping_docs(spark):
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s"),
        (2, "completely different words here nothing shared at all", "en", "s"),
        (3, "quick brown fox appears again quick brown fox twice", "en", "s"),
    ])
    bench = spark.createDataFrame(
        [(100, "question about the quick brown fox jumps high")],
        ["bench_id", "text"],
    )
    hits = cu.ngram_contamination(
        corpus, bench, bench_id_col="bench_id", n=3, min_hits=2
    ).collect()
    by_doc = {r.doc_id: r for r in hits}
    # doc 1 shares 'the quick brown', 'quick brown fox' (+ more) -> flagged
    assert 1 in by_doc and by_doc[1].bench_id == 100
    assert by_doc[1].n_hits >= 2
    # doc 3 shares only 'quick brown fox' (distinct shingles, repeats
    # inside the doc count once) -> below min_hits=2
    assert 3 not in by_doc
    assert 2 not in by_doc


def test_contamination_drop_via_left_anti(spark):
    corpus = _docs(spark, [
        (1, "alpha beta gamma delta", "en", "s"),
        (2, "totally unrelated content words", "en", "s"),
    ])
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma elsewhere")], ["bench_id", "text"])
    hits = cu.ngram_contamination(
        corpus, bench, bench_id_col="bench_id", n=3, min_hits=1)
    clean = corpus.join(hits.select("doc_id"), "doc_id", "left_anti")
    assert [r.doc_id for r in clean.collect()] == [2]


def test_contamination_benchmark_side_is_broadcast(spark):
    corpus = _docs(spark, [(1, "a b c d e", "en", "s")])
    bench = spark.createDataFrame([(9, "c d e f")], ["bench_id", "text"])
    hits = cu.ngram_contamination(
        corpus, bench, bench_id_col="bench_id", n=3)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # exactly ONE data shuffle: the (doc, bench) hit aggregation.
    # Per-doc shingle dedup is row-local (array_distinct pre-explode),
    # so no corpus-wide distinct Exchange may exist.
    assert plan.count("Exchange hashpartitioning") == 1


# -- repetition stats ------------------------------------------------------


def test_repetition_fractions_exact(spark):
    docs = _docs(spark, [
        (1, "a a a a", "en", "s"),          # 4 tokens, 1 distinct
        (2, "a b a b", "en", "s"),          # bigrams: ab ba ab -> 3/2
        (3, "w x y z", "en", "s"),          # no repetition at any n
    ])
    out = {r.doc_id: r for r in cu.repetition_stats(docs).collect()}
    assert (out[1].total_1, out[1].distinct_1) == (4, 1)
    assert out[1].dup_frac_ppm_1 == 750_000
    assert (out[2].total_2, out[2].distinct_2) == (3, 2)
    assert out[2].dup_frac_ppm_2 == 333_333  # floor(1e6/3)
    assert out[3].dup_frac_ppm_1 == 0
    assert out[3].dup_frac_ppm_2 == 0
    assert out[3].dup_frac_ppm_3 == 0


def test_repetition_short_doc_has_zero_ngrams(spark):
    docs = _docs(spark, [(1, "solo", "en", "s")])
    r = cu.repetition_stats(docs).collect()[0]
    assert (r.total_1, r.total_2, r.total_3) == (1, 0, 0)
    assert (r.dup_frac_ppm_2, r.dup_frac_ppm_3) == (0, 0)


def test_repetition_plan_is_pure_projection(spark):
    docs = _docs(spark, [(1, "a b c", "en", "s")])
    plan = cu.repetition_stats(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# -- stratified sampling ---------------------------------------------------


def test_sample_rate_bounds(spark):
    docs = _docs(spark, [(i, f"t {i}", "en", "s") for i in range(200)])
    none = cu.stratified_sample(
        docs, {"en": 0}, stratum_col="lang", key_cols=["doc_id"], seed=1)
    everything = cu.stratified_sample(
        docs, {"en": cu.PPM}, stratum_col="lang", key_cols=["doc_id"], seed=1)
    assert none.count() == 0
    assert everything.count() == 200


def test_sample_is_deterministic_and_partition_invariant(spark):
    docs = _docs(spark, [(i, f"t {i}", "en", "s") for i in range(500)])
    kw = dict(stratum_col="lang", key_cols=["doc_id"], seed="mix1")
    a = sorted(r.doc_id for r in
               cu.stratified_sample(docs, {"en": 300_000}, **kw).collect())
    b = sorted(r.doc_id for r in cu.stratified_sample(
        docs.repartition(7), {"en": 300_000}, **kw).collect())
    assert a == b and 0 < len(a) < 500
    # a different seed decides differently
    c = sorted(r.doc_id for r in cu.stratified_sample(
        docs, {"en": 300_000}, stratum_col="lang",
        key_cols=["doc_id"], seed="mix2").collect())
    assert a != c
    # rate is approximately honored (binomial 3-sigma ~ 61 at p=.3,n=500)
    assert abs(len(a) - 150) < 65


def test_sample_default_rate_and_strata_scoping(spark):
    docs = _docs(spark, [
        (i, "t", "en" if i % 2 == 0 else "zz", "s") for i in range(400)])
    kept = cu.stratified_sample(
        docs, {"en": cu.PPM}, stratum_col="lang", key_cols=["doc_id"],
        default_ppm=0, seed=5)
    langs = {r.lang for r in kept.collect()}
    assert langs == {"en"} and kept.count() == 200


def test_sample_rejects_bad_rate(spark):
    docs = _docs(spark, [(1, "t", "en", "s")])
    with pytest.raises(ValueError):
        cu.stratified_sample(docs, {"en": 2 * cu.PPM},
                             stratum_col="lang", key_cols=["doc_id"])


def test_sample_plan_has_no_exchange(spark):
    docs = _docs(spark, [(1, "t", "en", "s")])
    plan = cu.stratified_sample(
        docs, {"en": 1}, stratum_col="lang", key_cols=["doc_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- mixture planning ------------------------------------------------------


def test_mixture_rates_formula(spark):
    # src a: 10 tokens, src b: 2 tokens
    docs = _docs(spark, [
        (1, "w w w w w w w w w w", "en", "a"),
        (2, "w w", "en", "b"),
    ])
    plan = {r.source: r for r in cu.mixture_rates(
        docs, {"a": 500_000, "b": 500_000}, budget_tokens=10).collect()}
    assert plan["a"].source_tokens == 10
    assert plan["a"].target_tokens == 5
    assert plan["a"].rate_ppm == 500_000        # 5/10
    # source smaller than target saturates at keep-everything
    assert plan["b"].target_tokens == 5
    assert plan["b"].rate_ppm == cu.PPM


def test_mixture_omits_unweighted_sources_and_validates(spark):
    docs = _docs(spark, [(1, "w w", "en", "a"), (2, "w", "en", "ghost")])
    plan = cu.mixture_rates(docs, {"a": cu.PPM}, budget_tokens=4)
    assert [r.source for r in plan.collect()] == ["a"]
    with pytest.raises(ValueError):
        cu.mixture_rates(docs, {"a": -1}, budget_tokens=4)


def test_mixture_plan_feeds_sample_gate(spark):
    """End-to-end: census -> plan -> broadcast-join back -> gate."""
    docs = _docs(spark, [
        (i, "w " * 10, "en", "a" if i < 80 else "b") for i in range(100)])
    plan = cu.mixture_rates(
        docs, {"a": 500_000, "b": 500_000}, budget_tokens=400)
    gated = docs.join(F.broadcast(plan), "source").filter(
        cu.sample_gate(F.col("rate_ppm"), ["doc_id"], seed=3))
    counts = {r.source: r.cnt for r in gated.groupBy("source")
              .agg(F.count("*").alias("cnt")).collect()}
    # a: 800 tokens, target 200 -> rate .25 of 80 docs ~ 20; b saturates
    assert counts["b"] == 20
    assert 8 <= counts.get("a", 0) <= 35


# -- quality verdicts -------------------------------------------------------


def test_quality_verdicts_rules_and_reasons(spark):
    docs = _docs(spark, [
        (1, "one two three", "en", "s"),                      # too_short
        (2, "spam spam spam spam spam spam", "en", "s"),      # short+repetitive
        (3, " ".join(f"w{i}" for i in range(10)), "en", "s"),  # clean
        (4, "a b c d e f g h i j", "en", "s"),                # word_length (mwl=1)
    ])
    out = {r.doc_id: r for r in cu.quality_verdicts(
        docs, min_tokens=5, max_tokens=100, max_dup_2gram_ppm=500_000,
        min_mwl_e2=150, max_mwl_e2=900).collect()}
    assert out[1].reasons == "too_short" and out[1].keep is False
    # multi-reason ordering is the rule-ladder order, comma-joined
    assert out[2].reasons == "repetitive"
    assert out[2].dup_frac_ppm_2 == 800_000  # 5 bigrams, 1 distinct
    assert out[3].reasons == "" and out[3].keep is True
    assert out[4].reasons == "word_length" and out[4].mwl_e2 == 100


def test_quality_verdicts_multi_reason_order(spark):
    docs = _docs(spark, [(1, "x x x", "en", "s")])
    r = cu.quality_verdicts(
        docs, min_tokens=5, max_dup_2gram_ppm=100_000,
        min_mwl_e2=150, max_mwl_e2=900).collect()[0]
    assert r.reasons == "too_short,repetitive,word_length"


def test_quality_verdicts_plan_no_shuffle(spark):
    docs = _docs(spark, [(1, "a b c", "en", "s")])
    plan = cu.quality_verdicts(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_word_rank_score_ordering_and_vocab(spark):
    from sparkcdc.pipeline.curation import corpus_word_ranks, word_rank_score

    docs = spark.createDataFrame(
        [
            # common words repeated -> low ranks -> low score
            (0, "the the the cat cat sat"),
            # rare words -> high ranks -> higher score
            (1, "zyx qwv jkl"),
        ],
        "doc_id long, text string",
    )
    vocab = {r.word: r.rank for r in corpus_word_ranks(docs).collect()}
    assert vocab["the"] == 1 and vocab["cat"] == 2  # count desc, word asc
    out = {r.doc_id: r for r in word_rank_score(docs).collect()}
    assert out[0].n_tokens == 6 and out[1].n_tokens == 3
    assert out[0].score_e4 < out[1].score_e4
    assert out[0].oov_ppm == 0

    # supplied (restricted) vocabulary: unseen words count as OOV and are
    # excluded from the mean
    small = spark.createDataFrame([("the", 1)], "word string, rank long")
    out2 = {r.doc_id: r for r in word_rank_score(docs, vocab=small).collect()}
    assert out2[0].oov_ppm == 500_000  # 3 of 6 tokens
    assert out2[0].score_e4 == 0      # ln(1) = 0
    assert out2[1].oov_ppm == 1_000_000 and out2[1].score_e4 is None


def test_corpus_word_ranks_distributed_and_dense(spark):
    """Global ranking never plans a single-partition Window, and the
    range-slice + offset composition yields a dense permutation 1..|vocab|
    even when the vocab spans many slices (rank_partitions > 1)."""
    from sparkcdc.pipeline.curation import corpus_word_ranks

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j:03d}" for j in range(i + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    ranks = corpus_word_ranks(docs, rank_partitions=7)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the single-partition-sort trap
    rows = ranks.collect()
    # w000 appears 40x, w001 39x, ... -> rank i+1 for w{i:03d}
    assert sorted(r.rank for r in rows) == list(range(1, 41))
    byword = {r.word: r.rank for r in rows}
    assert byword["w000"] == 1 and byword["w039"] == 40


# -- URL normalization / domain filtering / URL dedup ---------------------------


def _urls_df(spark):
    rows = [
        (1, "HTTPS://WWW.Example.COM:443/a/b?utm_source=x&id=7&utm_medium=m#frag"),
        (2, "http://example.com/a/b?id=7"),
        (3, "http://user:pw@cdn.example.com./p"),
        (4, "https://news.bbc.co.uk/story?gclid=abc"),
        (5, "http://bbc.co.uk"),
        (6, "https://other.org/x?ref=tw&q=1"),
        (7, "http://localhost:8080/"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_normalize_url_canonical_form(spark):
    df = _urls_df(spark)
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", cu.normalize_url(F.col("url")).alias("n")
        ).collect()
    }
    # scheme+host lowered, www/port/userinfo/fragment/tracking params gone,
    # empty path -> /, surviving params keep order
    assert out[1] == "https://example.com/a/b?id=7"
    assert out[2] == "http://example.com/a/b?id=7"
    assert out[3] == "http://cdn.example.com/p"
    assert out[4] == "https://news.bbc.co.uk/story"
    assert out[5] == "http://bbc.co.uk/"
    assert out[6] == "https://other.org/x?q=1"
    assert out[7] == "http://localhost/"


def test_registrable_domain_multi_part_suffixes(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("news.bbc.co.uk",), ("bbc.co.uk",),
         ("co.uk",), ("localhost",), ("x.com.au",)],
        "host string",
    )
    got = [r["d"] for r in df.select(
        cu.registrable_domain(F.col("host")).alias("d")).collect()]
    assert got == ["example.com", "bbc.co.uk", "bbc.co.uk",
                   "co.uk", "localhost", "x.com.au"]


def test_domain_gate_blocklist_and_subdomains(spark):
    df = _urls_df(spark)
    # raw blocklist entries normalize through registrable_domain too
    out = cu.domain_gate(df, ["www.example.com", "BBC.co.uk"])
    blocked = {r["doc_id"]: r["blocked"] for r in out.collect()}
    assert blocked == {1: True, 2: True, 3: True, 4: True, 5: True,
                       6: False, 7: False}
    # the blocklist side is the broadcast side of one equality join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_url_dedup_first_seen_min_id(spark):
    df = _urls_df(spark)
    kept = cu.url_dedup(df)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1 and 2 normalize identically -> min id 1 survives; others unique
    assert ids == [1, 3, 4, 5, 6, 7]
    norm = {r["doc_id"]: r["norm_url"] for r in kept.collect()}
    assert norm[1] == "http://example.com/a/b?id=7"  # scheme collapsed


def test_url_ops_single_projection_no_shuffle(spark):
    df = _urls_df(spark)
    proj = df.select(
        cu.normalize_url(F.col("url")).alias("n"),
        cu.registrable_domain(cu.url_host(F.col("url"))).alias("d"),
    )
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_normalize_url_question_mark_inside_fragment_ignored(spark):
    df = spark.createDataFrame(
        [(1, "http://x.com/p#sec?b=1"), (2, "http://x.com/p?a=1#sec?b=2")],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", cu.normalize_url(F.col("url")).alias("n")).collect()}
    assert out[1] == "http://x.com/p"      # fragment fully dropped
    assert out[2] == "http://x.com/p?a=1"  # real query kept


# -- URL ops: hypothesis differential vs a pure-python reference ----------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_host(url):
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)", url)
    auth = m.group(2) if m else ""
    auth = _re.sub(r"^[^@]*@", "", auth)
    auth = _re.sub(r":[0-9]+$", "", auth)
    return _re.sub(r"\.$", "", auth.lower())


def _py_norm(url):
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    scheme = m.group(1).lower() if m else ""
    host = _re.sub(r"^www\.", "", _py_host(url))
    pm = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = (pm.group(1) if pm else "") or "/"
    qm = _re.match(r"^[^#]*\?([^#]*)", url)
    query = qm.group(1) if qm else ""
    kept = [kv for kv in query.split("&")
            if kv != "" and not _re.match(cu.TRACKING_PARAM_RE, kv.lower())]
    q = "&".join(kept)
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def _py_domain(host):
    ls = host.split(".")
    if len(ls) >= 3 and ".".join(ls[-2:]) in cu.MULTI_PART_SUFFIXES:
        return ".".join(ls[-3:])
    if len(ls) >= 2:
        return ".".join(ls[-2:])
    return host


_URL_BITS = st.builds(
    lambda scheme, user, www, sub, dom, suf, port, path, q, frag: (
        f"{scheme}://{user}{www}{sub}{dom}{suf}{port}{path}{q}{frag}"
    ),
    scheme=st.sampled_from(["http", "HTTPS", "ftp", "Http"]),
    user=st.sampled_from(["", "u@", "a:b@"]),
    www=st.sampled_from(["", "www.", "WWW."]),
    sub=st.sampled_from(["", "cdn.", "a.b."]),
    dom=st.sampled_from(["ex", "Ex-1", "x9"]),
    suf=st.sampled_from([".com", ".co.uk", ".org", ""]),
    port=st.sampled_from(["", ":80", ":8443"]),
    path=st.sampled_from(["", "/", "/p", "/a/b.c", "/p."]),
    q=st.sampled_from(["", "?", "?a=1", "?utm_source=x", "?a=1&utm_x=2&b=",
                       "?&a=1"]),
    frag=st.sampled_from(["", "#f", "#f?x=1", "#?"]),
)


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(urls=st.lists(_URL_BITS, min_size=1, max_size=12))
def test_url_ops_match_python_reference(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    got = df.select(
        "doc_id",
        cu.url_host(F.col("url")).alias("h"),
        cu.registrable_domain(cu.url_host(F.col("url"))).alias("d"),
        cu.normalize_url(F.col("url")).alias("n"),
    ).collect()
    for r in got:
        u = urls[r["doc_id"]]
        assert r["h"] == _py_host(u), u
        assert r["d"] == _py_domain(_py_host(u)), u
        assert r["n"] == _py_norm(u), u
