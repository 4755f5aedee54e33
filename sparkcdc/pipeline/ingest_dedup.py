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
    ) -> DataFrame:
        """First-seen documents of this batch: intra-batch dedup (min id
        per fingerprint) then anti-join against the committed index.

        Pure — commits nothing. Output = the batch's columns plus
        ``fingerprint``; feed it to the corpus sink and then to
        :meth:`commit_batch`. Deterministic on redelivery because the
        index state it reads is the pinned committed manifest.
        """
        fp = docs.withColumn("fingerprint", doc_fingerprint(text_col))
        row = F.struct(*[F.col(c) for c in fp.columns])
        first = (
            fp.groupBy("fingerprint")
            .agg(F.min_by(row, F.col(id_col)).alias("__row"))
            .select("__row.*")
        )
        index = self.table.read().select("fingerprint")
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
):
    """Structured-Streaming ingest curation: a streaming document feed is
    deduped per micro-batch against the persistent fingerprint index and
    only first-seen docs land in the corpus table.

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
    deduper = IncrementalDeduper.create_or_load(
        spark, root, n_buckets=n_buckets
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
        deduper.commit_batch(
            fresh.select("fingerprint", id_col),
            batch_id=batch_id, id_col=id_col,
        )

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
