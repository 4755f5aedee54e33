"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, repetition statistics, deterministic stratified
sampling, and token-budget mixture planning.

These are the passes a 100 TB pipeline runs between raw ingest and
tokenization, implemented from the public technique descriptions
(n-gram eval-set decontamination as described in the GPT-3/PaLM
appendices, repetition filters as in the Gopher/MassiveText rules,
weighted corpus mixing as in multilingual-corpus papers). They are
deliberately NOT part of the reference CDC engine's surface — they are
the downstream consumers the SURVEY's lake tables feed — but each is
built to the same standard as the dedup/similarity layer: pure
DataFrame ops, explicit broadcast/shuffle story, an exact DuckDB-SQL
twin for the driver oracle.

Scale notes per operator:

- :func:`ngram_contamination` — the benchmark side (an eval set:
  thousands of items, not billions) reduces to a DISTINCT shingle set
  and is explicitly ``broadcast()``; the corpus side explodes shingles
  and never shuffles on document pairs. Cost: one pass over corpus
  shingles + a map-side hash join, then one aggregation keyed on
  (doc, bench) — only matching shingles reach it, so its input is the
  hit set, not the corpus.
- :func:`repetition_stats` — a pure projection (tokens → shingle
  arrays → ``array_distinct`` sizes); zero shuffles, whole-stage
  codegen end to end. At 100 TB it is scan-bound.
- :func:`stratified_sample` — a deterministic hash gate
  (:func:`~sparkcdc.functions.hashing.stable_hash64` ``% 1e6 <
  rate_ppm``); zero shuffles, reproducible across runs/engines, and
  stable under re-partitioning (the decision depends only on key
  bytes, never on row order — ``df.sample`` can't promise that).
- :func:`mixture_rates` — one partial-aggregated ``groupBy(source)``
  over the corpus (the only shuffle in this module, on a
  cardinality-|sources| key), emitting a tiny plan table the caller
  broadcast-joins back for the sampling gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64
from ..functions.text import ngram_windows, shingles_from_tokens, tokens

#: sampling-rate fixed point: rates are integers in parts-per-million,
#: so both engines compare exact int64s (never a float threshold)
PPM = 1_000_000


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, n_hits) for corpus docs sharing ≥ ``min_hits``
    distinct word ``n``-grams with a benchmark item.

    The decontamination join every released-model data card describes:
    drop (or flag) training documents that overlap the eval set. The
    benchmark's DISTINCT shingle set is broadcast — an eval suite is
    thousands of items, so its shingle set fits every executor — and
    the corpus side streams through a map-side hash join; nothing
    quadratic, nothing keyed on documents until the per-(doc, bench)
    hit count, whose input is only the matching shingles.

    Drop usage: ``docs.join(hits, "doc_id", "left_anti")``.
    """
    bench_text = bench_text_col or text_col
    bench_id = bench_id_col or id_col
    doc_sh = _distinct_shingles(docs, text_col, id_col, n, "doc_id")
    bench_sh = _distinct_shingles(
        benchmark, bench_text, bench_id, n, "bench_id"
    )
    hits = doc_sh.join(F.broadcast(bench_sh), "shingle")
    return (
        hits.groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def _distinct_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, out_id: str
) -> DataFrame:
    # two-step (tokens materialized, THEN shingled) for the same
    # CollapseProject reason as dedup._exploded_shingles. A shingle
    # repeated inside one document counts once, and that dedup happens
    # ROW-LOCALLY: shingles_from_tokens applies array_distinct before
    # the explode, so (id, shingle) is already unique — no df.distinct()
    # (which would shuffle every corpus shingle before the broadcast
    # join pruned anything).
    toked = df.select(
        F.col(id_col).alias(out_id), tokens(text_col).alias("__toks")
    )
    return toked.select(
        out_id, F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("shingle")
    )


def repetition_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-document duplicate-n-gram fractions — the Gopher/MassiveText
    repetition signals (a document that keeps repeating itself is
    boilerplate or spam, not prose).

    For each ``n``: ``total_{n}`` n-grams, ``distinct_{n}`` n-grams,
    and ``dup_frac_ppm_{n}`` = ``(1 - distinct/total) * 1e6`` as an
    exact int64 (fixed-point so the DuckDB oracle compares integers).
    Pure projection — tokens once, per-n ``array_distinct`` sizes —
    zero shuffles, codegen end to end.
    """
    out = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    cols: list[Column] = [F.col("doc_id")]
    for n in ns:
        # RAW windows (ngram_windows, not the distinct shingle form) —
        # the duplicate count is the signal being measured
        sh = (
            F.col("__toks") if n == 1
            else ngram_windows(F.col("__toks"), n)
        )
        # long sizes BEFORE the ppm multiply: int32 × 1e6 overflows (and
        # ANSI mode, Spark 4's default, makes that a task failure)
        total = F.size(sh).cast("long")
        distinct = F.size(F.array_distinct(sh)).cast("long")
        # explicit floor() before the long cast: Spark's double→long cast
        # truncates while DuckDB's rounds, so the oracle must never see a
        # bare cast of a fractional value. Counts are tiny (≪2^53), so
        # the double division itself is IEEE-identical in both engines.
        cols += [
            total.cast("long").alias(f"total_{n}"),
            distinct.cast("long").alias(f"distinct_{n}"),
            F.when(total > 0,
                   F.floor((total - distinct) * PPM / total))
            .otherwise(F.lit(0)).cast("long").alias(f"dup_frac_ppm_{n}"),
        ]
    return out.select(*cols)


def quality_verdicts(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    max_dup_2gram_ppm: int = 200_000,
    min_mwl_e2: int = 300,
    max_mwl_e2: int = 1_000,
) -> DataFrame:
    """Gopher/C4-style keep/drop verdicts with machine-readable reasons —
    the rule-composition step of a quality filter: each document gets its
    signals (token count, duplicate-2-gram ppm, mean word length ×100),
    a comma-joined ``reasons`` string naming every rule it failed
    (``too_short,repetitive``; empty = clean), and a ``keep`` boolean.

    Reasons-as-data matter at 100 TB: a pipeline that only drops cannot
    answer "why did we lose 40% of source X", and re-running with a
    rule toggled means re-reading the corpus. All signals are integer
    fixed point so the verdict is engine-exact; the whole operator is a
    zero-shuffle projection (the token array materializes once in a
    staged column, same CollapseProject reasoning as
    :func:`repetition_stats`; the character-total ``aggregate`` lambda
    evaluates interpreted over that staged array, everything else
    codegens)."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    g2 = ngram_windows(toks, 2)
    t2 = F.size(g2).cast("long")
    d2 = F.size(F.array_distinct(g2)).cast("long")
    n = F.size(toks).cast("long")
    chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    sig = staged.select(
        "doc_id",
        n.alias("n_tokens"),
        F.when(t2 > 0, F.floor((t2 - d2) * PPM / t2))
        .otherwise(F.lit(0)).cast("long").alias("dup_frac_ppm_2"),
        F.round(
            F.round(F.when(n > 0, chars / n).otherwise(F.lit(0.0)), 6) * 100,
            0,
        ).cast("long").alias("mwl_e2"),
    )
    # ordered rule ladder; when() without otherwise() yields NULL on pass
    # and concat_ws skips NULLs in both engines
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short")),
        F.when(F.col("n_tokens") > max_tokens, F.lit("too_long")),
        F.when(F.col("dup_frac_ppm_2") > max_dup_2gram_ppm,
               F.lit("repetitive")),
        F.when((F.col("mwl_e2") < min_mwl_e2)
               | (F.col("mwl_e2") > max_mwl_e2), F.lit("word_length")),
    )
    return sig.select(
        "doc_id", "n_tokens", "dup_frac_ppm_2", "mwl_e2",
        reasons.alias("reasons"), (reasons == "").alias("keep"),
    )


def sample_gate(
    rate_ppm: Column, key_cols: list[str], *, seed: int | str | None = None
) -> Column:
    """The deterministic keep-predicate: ``hash(key) % 1e6 < rate_ppm``.

    Deterministic in the key bytes alone — reproducible across runs,
    engines (DuckDB twin via ``stable_hash_sql``), repartitionings, and
    incremental arrivals (a new file's rows get the same verdict they
    would have gotten in the original pass; ``df.sample`` guarantees
    none of that). Uniform because sha256 is.
    """
    return F.pmod(stable_hash64(*key_cols, seed=seed), F.lit(PPM)) < rate_ppm


def stratified_sample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    *,
    stratum_col: str,
    key_cols: list[str],
    default_ppm: int = 0,
    seed: int | str | None = None,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    deterministic hash of the row key — per-language / per-source
    downsampling without a shuffle and without RNG state.

    ``rates_ppm`` maps stratum value → parts-per-million keep rate;
    unlisted strata get ``default_ppm``.
    """
    for v in list(rates_ppm.values()) + [default_ppm]:
        if not (0 <= int(v) <= PPM):
            raise ValueError(f"rate_ppm out of [0, 1e6]: {v}")
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates_ppm.items() for x in (kv[0], int(kv[1]))]
    )
    rate = F.coalesce(
        F.element_at(rate_map, F.col(stratum_col)), F.lit(int(default_ppm))
    )
    return df.filter(sample_gate(rate, key_cols, seed=seed))


def mixture_rates(
    docs: DataFrame,
    weights_ppm: dict[str, int],
    *,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source sampling plan hitting a token budget at given mixture
    weights: (source, source_tokens, target_tokens, rate_ppm).

    ``weights_ppm`` is the desired mixture in parts-per-million of
    ``budget_tokens`` (e.g. {"web": 600_000, "code": 400_000}); each
    source's keep rate is ``min(1e6, target/source_tokens)`` — a source
    smaller than its target saturates at keep-everything (the standard
    "epochs capped at 1" simplification; oversampling is a repeat-count
    concern, not a filter). Integer fixed-point throughout so the plan
    is engine-exact. One groupBy(source) over the corpus (partial aggs
    do the heavy lifting map-side); the emitted plan is |sources| rows
    — broadcast-join it back and gate with :func:`sample_gate`.
    """
    for v in weights_ppm.values():
        if not (0 <= int(v) <= PPM):
            raise ValueError(f"weight_ppm out of [0, 1e6]: {v}")
    w_map = F.create_map(
        *[F.lit(x) for kv in weights_ppm.items() for x in (kv[0], int(kv[1]))]
    )
    per_source = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(tokens(text_col)).cast("long").alias("__tok"),
        )
        .groupBy("source")
        .agg(F.sum("__tok").alias("source_tokens"))
    )
    # fixed-point in DOUBLES end to end with explicit floor() (Spark's
    # double→long cast truncates, DuckDB's rounds — never bare-cast a
    # fraction). Doubles, not longs, for the multiplies: weight_ppm ×
    # a 100 TB-scale token budget (~2.5e13 tokens) is ~1e19 > 2^63, an
    # ANSI-mode ARITHMETIC_OVERFLOW as a long multiply; as doubles the
    # result is off by <1 ppm beyond 2^53, below the plan's own
    # resolution. Sources absent from weights_ppm get no plan row
    # (weight 0 — drop the source entirely).
    target = F.floor(
        F.element_at(w_map, F.col("source")).cast("double")
        * F.lit(float(budget_tokens)) / PPM
    ).cast("long")
    return per_source.select(
        "source",
        "source_tokens",
        target.alias("target_tokens"),
        F.least(
            F.lit(PPM).cast("long"),
            F.floor(
                target.cast("double") * PPM / F.col("source_tokens")
            ).cast("long"),
        ).alias("rate_ppm"),
    ).filter(target.isNotNull())


# ---------------------------------------------------------------------------
# Corpus-frequency quality score (CCNet-style word-rank proxy)
# ---------------------------------------------------------------------------


#: monotonically_increasing_id's documented layout: partition id in the
#: upper 31 bits, per-partition record index in the lower 33
_MID_ROW_BITS = 33


def corpus_word_ranks(
    docs: DataFrame, text_col: str = "text", *,
    rank_partitions: int | None = None,
) -> DataFrame:
    """Frequency-rank vocabulary derived from the corpus: (word, rank),
    rank 1 = most frequent; ties broken by word for cross-engine
    determinism.

    The distinct-vocab aggregation is a partial-agg groupBy over tokens.
    The global ranking itself is DISTRIBUTED — a global
    ``row_number().over(Window.orderBy(...))`` would pull the whole
    vocabulary through one task (the single-partition-sort trap, same
    reason IVF seeding uses TakeOrderedAndProject). Instead:
    ``repartitionByRange`` on the rank order splits the vocab into
    ``rank_partitions`` globally-ordered slices, each slice sorts and
    numbers locally (``monotonically_increasing_id`` after
    ``sortWithinPartitions`` = partition id ``<<33 |`` local index), and
    one control-plane job collects the per-slice row counts (≤ one row
    per partition) to turn local indexes into exact global ranks. Two
    narrow shuffles of (word, n) pairs and no single-task sort. The
    sliced frame is PINNED (eager localCheckpoint, O(vocab)) before the
    sizes job: range boundaries come from a reservoir SAMPLE of the
    parent, so re-executing the exchange in the sizes job and the output
    job could sample different boundaries once slices exceed the sample
    size — and the pin also keeps the corpus tokenize+groupBy from
    running twice.
    """
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = docs.sparkSession
    parts = rank_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    order = [F.col("n").desc(), F.col("word").asc()]
    # explicit numPartitions => AQE never re-coalesces this exchange, so
    # partition ids are stable across the two jobs below
    sliced = (
        counts.repartitionByRange(parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    pid = F.shiftright(F.col("__mid"), _MID_ROW_BITS).cast("int")
    sizes = sorted(
        sliced.groupBy(pid.alias("__pid")).count().collect(),
        key=lambda r: r["__pid"],
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sizes:  # range slices are ordered, so pid order = rank order
        offsets[r["__pid"]] = acc
        acc += r["count"]
    if not offsets:
        return counts.select("word", F.lit(None).cast("long").alias("rank"))
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    local_ix = F.col("__mid") - F.shiftleft(
        pid.cast("long"), _MID_ROW_BITS
    )
    return sliced.select(
        "word",
        (local_ix + F.element_at(off_map, pid) + 1)
        .cast("long").alias("rank"),
    )


def word_rank_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean log word-frequency-rank — the CCNet-style
    statistical quality proxy (CCNet ranks documents by language-model
    perplexity; mean log rank against a frequency vocabulary is its
    lightweight stand-in): LOW score = common, natural word distribution;
    HIGH score = rare/garbled vocabulary. Use with a threshold or as a
    ranking key for head/middle/tail bucketing.

    ``vocab`` (word, rank): pass a precomputed table at scale (broadcast
    join — it is a vocabulary, not a corpus); defaults to
    :func:`corpus_word_ranks` of the input itself. Out-of-vocabulary
    words count via ``oov_ppm`` and are excluded from the mean.

    Output: (doc_id, n_tokens, oov_ppm, score_e4) with
    score_e4 = round(mean(ln rank), 4 dp) × 10^4 as BIGINT — the repo's
    cross-engine float-stability idiom.
    """
    if vocab is None:
        vocab = corpus_word_ranks(docs, text_col)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("word"),
    ).filter(F.col("word") != "")
    joined = toks.join(F.broadcast(vocab), "word", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.floor(
                F.count(F.when(F.col("rank").isNull(), 1))
                * 1_000_000
                / F.count(F.lit(1))
            ).cast("long").alias("oov_ppm"),
            (F.round(F.round(F.avg(F.log(F.col("rank"))), 6) * 10_000)
             .cast("long")).alias("score_e4"),
        )
    )


# ---------------------------------------------------------------------------
# URL normalization / domain filtering / URL-level dedup
# ---------------------------------------------------------------------------

#: query parameters that carry tracking state, not content identity —
#: the standard strip set of web-corpus pipelines (utm_* campaign tags,
#: per-platform click ids). One alternation, anchored, lowercase-matched.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z]+|fbclid|gclid|dclid|msclkid|mc_eid|igshid|yclid"
    r"|wbraid|gbraid|_ga|ref|ref_src)="
)

#: two-label public suffixes under which the registrable domain is the
#: LAST THREE labels (a deliberately small embedded subset of the public
#: suffix list covering the common ccTLD second-level registries; the
#: full Mozilla PSL is a drop-in replacement for the membership test).
MULTI_PART_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za", "com.sg", "com.hk", "com.tw",
]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_host(url: Column) -> Column:
    """Lowercased host of *url*: authority minus userinfo, port, and any
    trailing dot. Pure codegen (three anchored regexes + lower)."""
    auth = F.regexp_extract(url, _SCHEME_RE + r"([^/?#]*)", 2)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    no_port = F.regexp_replace(no_user, r":[0-9]+$", "")
    return F.regexp_replace(F.lower(no_port), r"\.$", "")


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of a host: last two labels, or last three when the last two
    are a multi-part public suffix (:data:`MULTI_PART_SUFFIXES`). The
    domain-blocklist join key — subdomain variants (``cdn.x.com``,
    ``www.x.com``) collapse to one equality key, so a blocklist gate is
    an exact broadcast hash join, never a ``LIKE '%.domain'`` scan."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    return (
        F.when((n >= 3) & last2.isin(MULTI_PART_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def normalize_url(
    url: Column, *, strip_params: bool = True, collapse_scheme: bool = False
) -> Column:
    """Canonical form of a URL for exact URL-level dedup:

    - scheme and host lowercased; ``www.`` prefix, userinfo, port, and
      trailing host dot stripped;
    - fragment dropped;
    - empty path becomes ``/``;
    - with *strip_params*, tracking query parameters
      (:data:`TRACKING_PARAM_RE`) and empty pairs are removed (remaining
      params keep their order — reordering would conflate distinct
      server semantics);
    - with *collapse_scheme*, ``https`` folds to ``http`` (the dedup-key
      setting: the same page crawled over both schemes is one document).

    One codegen projection — no shuffle, no UDF; the same spelling in
    DuckDB SQL is the driver oracle's twin.
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    if collapse_scheme:
        scheme = F.when(scheme == "https", F.lit("http")).otherwise(scheme)
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    path = F.regexp_extract(url, _SCHEME_RE + r"[^/?#]*([^?#]*)", 2)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # the '?' must precede any '#': an unanchored match would resurrect a
    # '?' from inside the (dropped) fragment as a fabricated query
    query = F.regexp_extract(url, r"^[^#]*\?([^#]*)", 1)
    if strip_params:
        kept = F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "") & ~F.lower(kv).rlike(TRACKING_PARAM_RE),
        )
    else:
        kept = F.filter(F.split(query, "&"), lambda kv: kv != "")
    q = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def domain_gate(
    docs: DataFrame,
    blocklist: DataFrame | list[str],
    *,
    url_col: str = "url",
    out_col: str = "blocked",
) -> DataFrame:
    """Mark documents whose URL's registrable domain is on a blocklist
    (the C4/UT1-style domain filter). Adds ``host``/``domain`` columns
    and a boolean *out_col*.

    Scale shape: the blocklist — even the multi-million-entry UT1 set is
    ~100 MB — is the broadcast side of ONE hash join on the equality key
    ``domain``; the corpus side is a pure projection (no corpus shuffle,
    no regex-per-blocklist-entry). Blocklist entries are themselves
    normalized through :func:`registrable_domain`, so ``www.x.com`` in a
    raw list file gates the same key as ``x.com``."""
    spark = docs.sparkSession
    if isinstance(blocklist, list):
        blocklist = spark.createDataFrame(
            [(d,) for d in blocklist], "entry string")
    else:
        entry = blocklist.columns[0]
        blocklist = blocklist.select(F.col(entry).alias("entry"))
    bl = blocklist.select(
        registrable_domain(F.lower(F.col("entry"))).alias("domain")
    ).distinct().withColumn("__blocked", F.lit(True))
    host = url_host(F.col(url_col))
    with_dom = docs.withColumn("host", host).withColumn(
        "domain", registrable_domain(F.col("host"))
    )
    return (
        with_dom.join(F.broadcast(bl), "domain", "left")
        .withColumn(out_col, F.coalesce(F.col("__blocked"), F.lit(False)))
        .drop("__blocked")
    )


def url_dedup(
    docs: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_params: bool = True,
) -> DataFrame:
    """Keep one document per normalized URL — the first-seen (minimum
    *id_col*) occurrence, the deterministic tie-break every dedup
    operator in this package uses. One hash-partial ``min_by`` aggregate
    keyed on the normalized URL (same single-shuffle shape as
    ``dedup.distinct_documents``); no join-back, no window. The dedup key
    collapses https/http (``collapse_scheme``)."""
    norm = normalize_url(
        F.col(url_col), strip_params=strip_params, collapse_scheme=True)
    keyed = docs.withColumn("__norm_url", norm)
    row = F.struct(*[F.col(c) for c in keyed.columns if c != "__norm_url"])
    return (
        keyed.groupBy("__norm_url")
        .agg(F.min_by(row, F.col(id_col)).alias("__row"))
        .select(F.col("__norm_url").alias("norm_url"), "__row.*")
    )
