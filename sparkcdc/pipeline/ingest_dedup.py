"""Incremental (ingest-time) exact dedup: new document batches are deduped
against the already-committed corpus, not against themselves alone.

This is how dedup actually runs at 100 TB: the corpus is never re-deduped
per batch — each arriving micro-batch anti-joins its fingerprints against a
persistent fingerprint *index* and only first-seen documents survive. The
index here is a keyed :class:`~sparkcdc.lake.LakeTable`
(``fingerprint -> first_doc_id``), so it inherits the engine's commit
fencing, snapshot-isolated reads, schema evolution, and MOR/COW compaction
for free — the same machinery the CDC sink uses (reference analog: the
JDBC sink's idempotent upsert path, jdbc-sink/JdbcChangeEventSink.java:72).

Exactly-once contract (same discipline as CdcEngine): call
:meth:`IncrementalDeduper.dedup_batch` (pure), write the survivors to the
corpus sink fenced by ``batch_id``, then :meth:`commit_batch` with the SAME
``batch_id``. On redelivery after a crash between the two commits, the
fresh set is re-derived identically (the index does not yet contain it),
the corpus sink fences the duplicate write, and the index commit proceeds —
no document is ever lost or double-admitted.

Scale shape per batch: fingerprints are 64-char hashes; the index read is
column-pruned to the key, the anti-join shuffles O(batch + index keys) —
never document payloads — and the index commit is the lake's O(batch)
bucket-delta write. With ``mode='mor'`` the trickle path never rewrites
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint
from ..lake import LakeTable


class IncrementalDeduper:
    """Persistent exact-dedup index over a keyed lake table."""

    def __init__(self, table: LakeTable, writer: str = "ingest_dedup"):
        self.table = table
        self.writer = writer

    @classmethod
    def create_or_load(
        cls,
        spark: SparkSession,
        root: str,
        name: str = "doc_fingerprints",
        n_buckets: int = 16,
        writer: str = "ingest_dedup",
    ) -> "IncrementalDeduper":
        if LakeTable.exists(root, name):
            table = LakeTable.load(spark, root, name)
        else:
            table = LakeTable.create(
                spark, root, name,
                fields=[("fingerprint", "string"), ("first_doc_id", "long")],
                key_cols=["fingerprint"],
                n_buckets=n_buckets,
            )
        return cls(table, writer=writer)

    def dedup_batch(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        bucket_pruned: bool = True,
    ) -> DataFrame:
        """First-seen documents of this batch: intra-batch dedup (min id
        per fingerprint) then anti-join against the committed index.

        Pure — commits nothing. Output = the batch's columns plus
        ``fingerprint``; feed it to the corpus sink and then to
        :meth:`commit_batch`. Deterministic on redelivery because the
        index state it reads is the pinned committed manifest.

        ``bucket_pruned`` (default) probes only the index buckets this
        batch's fingerprints hash into: a batch key can only match an
        index key in its own bucket, so the anti-join reads O(touched
        buckets) of the index instead of all of it — the point-probe
        shape that keeps per-batch cost flat as the committed corpus
        grows to 100 TB. Costs one extra O(batch) pass to collect the
        bucket set (bounded by n_buckets ints).
        """
        fp = docs.withColumn("fingerprint", doc_fingerprint(text_col))
        row = F.struct(*[F.col(c) for c in fp.columns])
        first = (
            fp.groupBy("fingerprint")
            .agg(F.min_by(row, F.col(id_col)).alias("__row"))
            .select("__row.*")
        )
        buckets = (
            self.table.touched_buckets(fp.select("fingerprint"))
            if bucket_pruned else None
        )
        index = self.table.read(buckets=buckets).select("fingerprint")
        return first.join(index, "fingerprint", "left_anti")

    def commit_batch(
        self, fresh: DataFrame, batch_id: int, id_col: str = "doc_id"
    ) -> dict:
        """Admit a batch's first-seen fingerprints into the index —
        idempotent per (writer, batch_id) via the lake's commit fence.

        ``fresh`` is :meth:`dedup_batch` output (must still carry
        ``fingerprint`` and ``id_col``).
        """
        from ..lake import type_of

        id_field = [
            f for f in self.table.manifest().fields
            if f.name != "fingerprint"
        ][0]
        changes = fresh.select(
            F.col("fingerprint"),
            F.col(id_col).cast(type_of(id_field.type)).alias(id_field.name),
            F.lit("u").alias("_op"),
        )
        return self.table.merge(
            changes, batch_id=batch_id, writer=self.writer, mode="mor"
        )

    def process_batch(
        self,
        docs: DataFrame,
        batch_id: int,
        text_col: str = "text",
        id_col: str = "doc_id",
        sink=None,
    ) -> DataFrame:
        """dedup_batch + corpus sink + commit_batch in one call, in the
        module contract's order: ``sink(fresh)`` — the corpus write,
        fenced by the caller on the same ``batch_id`` — runs BEFORE the
        index commit, so a crash at any point re-derives the identical
        fresh set on redelivery and no document can be admitted to the
        index yet lost from the corpus. Callers whose only state IS the
        index (no separate corpus table) may omit ``sink``.

        The fresh set is pinned with an O(batch) ``localCheckpoint`` so
        neither the sink nor the returned DataFrame lazily re-reads the
        index the commit advances.
        """
        fresh = self.dedup_batch(
            docs, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
        if sink is not None:
            sink(fresh)
        self.commit_batch(
            fresh.select("fingerprint", id_col),
            batch_id=batch_id, id_col=id_col,
        )
        return fresh


class IncrementalNearDeduper:
    """Ingest-time NEAR-dedup: arriving batches are MinHash/LSH-banded and
    any document sharing a band signature with the committed corpus is
    dropped; survivors register ALL their band keys in a persistent index.

    Shares :func:`~sparkcdc.pipeline.dedup.doc_bands` with the batch
    deduper (`minhash_lsh_candidates`), so the incremental path collides
    on exactly the keys the batch path would — an ingest-time front-end
    to the same LSH family (reference analog: the snapshot-window dedup
    buffer of incremental snapshots, generalized from exact-key to
    similarity keys; debezium-core
    AbstractIncrementalSnapshotChangeEventSource.java window dedup).

    Index table: keyed ``(band, band_sig) -> first_doc_id``. Only ADMITTED
    documents register bands — a doc near-dup to a *dropped* doc but not
    to any admitted doc is admitted (standard online/greedy corpus
    curation semantics, e.g. the RefinedWeb/CCNet ingestion pipelines).
    Docs too short to produce a shingle have no band keys and ALWAYS pass
    through (they cannot collide, and are not exactly-once under
    redelivery) — route short docs through :class:`IncrementalDeduper`
    if exact dedup of them matters.

    Intra-batch resolution (``intra=``):

    - ``per_band_min`` (default): a doc survives iff it is the min id in
      EVERY band it belongs to — one window + one groupBy, no iteration.
      Equivalently: drop x iff some band-mate has a smaller id, applied
      transitively down chains. Kept docs never share a band, so the
      index merge is conflict-free.
    - ``clusters``: exact connected-components via
      :func:`~sparkcdc.pipeline.dedup.duplicate_clusters` (pointer
      jumping), keep each component's min. Strictly fewer keepers than
      ``per_band_min`` on chain topologies (A~B on band 1, B~C on band
      2 with C minimal in its own bands: per_band_min keeps A and C,
      clusters keeps only A); costs O(log diameter) joins per batch.

    Exactly-once: same contract as :class:`IncrementalDeduper` —
    ``dedup_batch`` is pure against the pinned committed manifest, the
    corpus write is fenced by ``batch_id``, and ``commit_batch`` is
    idempotent per (writer, batch_id) via the lake's commit fence.

    Scale shape per batch: the minhash pass is O(batch tokens) with
    map-side partial mins; the index probe is a band-key anti-join that
    shuffles O(batch × n_bands + index keys) small rows — never document
    payloads; the commit is the lake's O(batch) bucket-delta write.
    """

    def __init__(
        self,
        table: LakeTable,
        writer: str = "ingest_neardedup",
        *,
        num_hashes: int = 16,
        band_size: int = 4,
        shingle_n: int = 3,
        fast: bool = True,
    ):
        self.table = table
        self.writer = writer
        self.num_hashes = num_hashes
        self.band_size = band_size
        self.shingle_n = shingle_n
        self.fast = fast

    @classmethod
    def create_or_load(
        cls,
        spark: SparkSession,
        root: str,
        name: str = "doc_band_index",
        n_buckets: int = 16,
        writer: str = "ingest_neardedup",
        **lsh_params,
    ) -> "IncrementalNearDeduper":
        if LakeTable.exists(root, name):
            table = LakeTable.load(spark, root, name)
        else:
            table = LakeTable.create(
                spark, root, name,
                fields=[
                    ("band", "int"),
                    ("band_sig", "string"),
                    ("first_doc_id", "long"),
                ],
                key_cols=["band", "band_sig"],
                n_buckets=n_buckets,
            )
        return cls(table, writer=writer, **lsh_params)

    def _bands(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        from .dedup import doc_bands

        return doc_bands(
            docs, text_col, id_col,
            num_hashes=self.num_hashes, band_size=self.band_size,
            shingle_n=self.shingle_n, fast=self.fast,
        )

    def dedup_batch(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        intra: str = "per_band_min",
        bucket_pruned: bool = True,
    ) -> DataFrame:
        """Admitted documents of this batch: batch columns plus ``bands``
        (array<struct<band,band_sig>> — every band key the doc will
        register). Pure — commits nothing; deterministic on redelivery
        because the index read is the pinned committed manifest.

        ``bucket_pruned`` (default) probes only the index buckets this
        batch's band keys hash into (see
        :meth:`IncrementalDeduper.dedup_batch`) — at scale the band
        index is docs × n_bands rows, and the probe must not re-read it
        whole per batch. The batch's band keys are pinned once
        (localCheckpoint), so the bucket probe costs one O(batch)
        collect of bucket ids — noise next to the O(index) read it
        avoids.
        """
        # pin the band keys once: the subtree is referenced by the bucket
        # probe, the hit-join, and the survivor set — without the pin the
        # minhash (shingle explode + 16 mins) would run once per reference
        bands = self._bands(docs, text_col, id_col).localCheckpoint(
            eager=True
        )
        buckets = (
            self.table.touched_buckets(bands.select("band", "band_sig"))
            if bucket_pruned else None
        )
        committed = self.table.read(buckets=buckets).select("band", "band_sig")
        hit_docs = bands.join(
            committed, ["band", "band_sig"], "left_semi"
        ).select("doc").distinct()
        surv = bands.join(hit_docs, "doc", "left_anti")

        if intra == "per_band_min":
            # groupBy + join-back rather than a window over (band,
            # band_sig): the groupBy min combines map-side and the
            # join-back is an equi-join AQE can skew-split, so a hot band
            # key (thousands of identical docs in one batch) never pins
            # all its rows on a single un-combined window task
            band_min = surv.groupBy("band", "band_sig").agg(
                F.min("doc").alias("__bmin")
            )
            keep = (
                surv.join(band_min, ["band", "band_sig"])
                .groupBy("doc")
                .agg(
                    F.min(F.col("doc") == F.col("__bmin")).alias("__all_min"),
                    F.collect_list(
                        F.struct("band", "band_sig")
                    ).alias("bands"),
                )
                .filter("__all_min")
                .select("doc", "bands")
            )
        elif intra == "clusters":
            from .dedup import duplicate_clusters

            a, b = surv.alias("a"), surv.alias("b")
            pairs = (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.band_sig") == F.col("b.band_sig"))
                    & (F.col("a.doc") < F.col("b.doc")),
                )
                .select(
                    F.col("a.doc").alias("doc_a"),
                    F.col("b.doc").alias("doc_b"),
                )
                .distinct()
            )
            losers = (
                duplicate_clusters(pairs, "doc_a", "doc_b")
                .filter(F.col("doc") != F.col("cluster"))
                .select("doc")
            )
            keep = (
                surv.join(losers, "doc", "left_anti")
                .groupBy("doc")
                .agg(F.collect_list(F.struct("band", "band_sig")).alias("bands"))
            )
        else:
            raise ValueError(
                f"unknown intra-batch mode {intra!r}; "
                "use 'per_band_min' or 'clusters'"
            )

        kept = docs.join(
            keep.withColumnRenamed("doc", "__keep_id"),
            F.col(id_col) == F.col("__keep_id"),
        ).drop("__keep_id")
        # docs too short to shingle produce NO bands — they cannot collide
        # with anything, so they are always admitted (with an empty band
        # set, contributing nothing to the index)
        bandless = docs.join(
            bands.select(F.col("doc").alias("__banded_id")).distinct(),
            F.col(id_col) == F.col("__banded_id"),
            "left_anti",
        ).withColumn(
            "bands",
            F.array().cast("array<struct<band:int,band_sig:string>>"),
        )
        return kept.unionByName(bandless)

    def commit_batch(
        self, fresh: DataFrame, batch_id: int, id_col: str = "doc_id"
    ) -> dict:
        """Register an admitted batch's band keys — idempotent per
        (writer, batch_id). ``fresh`` is :meth:`dedup_batch` output (must
        still carry ``bands`` and ``id_col``)."""
        from ..lake import type_of

        id_field = [
            f for f in self.table.manifest().fields
            if f.name not in ("band", "band_sig")
        ][0]
        changes = (
            fresh.select(F.col(id_col), F.explode("bands").alias("b"))
            .select(
                F.col("b.band").alias("band"),
                F.col("b.band_sig").alias("band_sig"),
                F.col(id_col).cast(type_of(id_field.type)).alias(id_field.name),
                F.lit("u").alias("_op"),
            )
        )
        return self.table.merge(
            changes, batch_id=batch_id, writer=self.writer, mode="mor"
        )

    def process_batch(
        self,
        docs: DataFrame,
        batch_id: int,
        text_col: str = "text",
        id_col: str = "doc_id",
        sink=None,
        intra: str = "per_band_min",
    ) -> DataFrame:
        """dedup_batch + corpus sink + commit_batch, in the module
        contract's order (corpus write BEFORE the index commit — see
        :meth:`IncrementalDeduper.process_batch`)."""
        fresh = self.dedup_batch(
            docs, text_col=text_col, id_col=id_col, intra=intra
        ).localCheckpoint(eager=True)
        if sink is not None:
            sink(fresh)
        self.commit_batch(
            fresh.select(id_col, "bands"), batch_id=batch_id, id_col=id_col
        )
        return fresh


def start_dedup_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    root: str,
    *,
    corpus_fields: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
    trigger_interval: str = "1 second",
    method: str = "exact",
    **lsh_params,
):
    """Structured-Streaming ingest curation: a streaming document feed is
    deduped per micro-batch against the persistent fingerprint index and
    only first-seen docs land in the corpus table.

    ``method='exact'`` (default) dedups on the document fingerprint;
    ``method='minhash'`` dedups on LSH band collisions via
    :class:`IncrementalNearDeduper` (extra ``lsh_params`` — num_hashes,
    band_size, shingle_n, fast — are forwarded).

    Commit order per micro-batch follows the module contract: corpus
    append FIRST (keyless lake table, fenced per batch_id), then the
    index commit with the same batch_id — so a crash between the two
    re-derives the identical fresh set on redelivery, the corpus fence
    eats the duplicate write, and the index catches up. Both tables live
    under ``root`` (``corpus_docs`` / ``doc_fingerprints``).

    Returns (query, deduper, corpus_table).
    """
    if LakeTable.exists(root, "corpus_docs"):
        corpus = LakeTable.load(spark, root, "corpus_docs")
    else:
        corpus = LakeTable.create(
            spark, root, "corpus_docs",
            fields=corpus_fields, key_cols=[], n_buckets=n_buckets,
        )
    if method == "exact":
        deduper = IncrementalDeduper.create_or_load(
            spark, root, n_buckets=n_buckets
        )
    elif method == "minhash":
        deduper = IncrementalNearDeduper.create_or_load(
            spark, root, n_buckets=n_buckets, **lsh_params
        )
    else:
        raise ValueError(
            f"unknown dedup method {method!r}; use 'exact' or 'minhash'"
        )
    cols = [n for n, _ in corpus_fields]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fresh = deduper.dedup_batch(
            batch_df, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
        corpus.append(fresh.select(*cols), batch_id=batch_id,
                      writer="dedup_stream")
        # commit_batch selects the state columns it needs (fingerprint
        # for exact, bands for minhash) from the full fresh frame
        deduper.commit_batch(fresh, batch_id=batch_id, id_col=id_col)

    if checkpoint_dir is None:
        import os

        checkpoint_dir = os.path.join(root, "dedup_stream_ckpt")
    writer = docs_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start(), deduper, corpus
