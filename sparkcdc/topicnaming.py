"""Topic naming strategies — the TopicNamingStrategy SPI that names every
outbound stream of a connector.

Reference: schema/AbstractTopicNamingStrategy.java (config fields
``topic.delimiter`` / ``topic.heartbeat.prefix`` / ``topic.transaction``,
the control-topic derivations, and ``sanitizedTopicName``),
DefaultTopicNamingStrategy.java (prefix + database parts),
SchemaTopicNamingStrategy.java (prefix + schema parts),
AbstractRegexTopicNamingStrategy.java (``topic.regex`` +
``topic.replacement`` over the base name, full-match only),
UnicodeReplacementFunction.java (``_u`` + zero-padded hex escapes),
spi/topic/TopicNamingStrategy.java (MAX_NAME_LENGTH = 249).

Two consumption shapes:

- driver-side ``TopicNamingStrategy`` object for control topics and the
  bounded per-collection cache (the reference's LRU map — a connector
  names thousands of tables, not billions);
- :func:`apply_topic_names` for per-row routing columns: the distinct
  (db, table) pairs are collected (bounded, same cardinality the
  reference caches) and joined back as a literal map, so the per-row
  path stays pure Catalyst whatever the replacement mode.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Kafka's topic-name length cap (spi/topic/TopicNamingStrategy.java:22)
MAX_NAME_LENGTH = 249

DEFAULT_HEARTBEAT_TOPIC_PREFIX = "__debezium-heartbeat"
DEFAULT_TRANSACTION_TOPIC = "transaction"

_VALID_UNDERSCORE = re.compile(r"[A-Za-z0-9._-]")
# unicode mode treats '_' as the escape lead-in, so it is NOT valid there
# (AbstractUnicodeTopicNamingStrategy.isValidCharacter)
_VALID_UNICODE = re.compile(r"[A-Za-z0-9.-]")


def _unicode_escape(ch: str) -> str:
    hx = format(ord(ch), "x")
    if len(hx) <= 2:
        hx = "00" + hx
    return "_u" + hx


class TopicNamingStrategy:
    """``topic.naming.strategy`` with the reference's three families:

    - ``default``: ``prefix.db.table`` (database parts);
    - ``schema``: ``prefix.schema.table`` (schema parts — for connectors
      whose collections are schema-scoped, e.g. Postgres/SQL Server);
    - add ``topic_regex``/``topic_replacement`` to either for the regex
      variants (DefaultRegexTopicNamingStrategy etc.): the regex must
      FULL-match the base name to rewrite it, otherwise it passes
      through unchanged.

    ``replacement`` is ``underscore`` (invalid char -> ``_``) or
    ``unicode`` (invalid char -> ``_u`` + zero-padded lowercase hex,
    reversible).
    """

    def __init__(
        self,
        prefix: str,
        *,
        strategy: str = "default",
        delimiter: str = ".",
        transaction: str = DEFAULT_TRANSACTION_TOPIC,
        heartbeat_prefix: str = DEFAULT_HEARTBEAT_TOPIC_PREFIX,
        replacement: str = "underscore",
        topic_regex: str | None = None,
        topic_replacement: str | None = None,
    ):
        if strategy not in ("default", "schema"):
            raise ValueError(f"unknown topic naming strategy {strategy!r}")
        if replacement not in ("underscore", "unicode"):
            raise ValueError(f"unknown replacement mode {replacement!r}")
        if (topic_regex is None) != (topic_replacement is None):
            raise ValueError(
                "topic.regex and topic.replacement must be set together"
            )
        self.prefix = prefix
        self.strategy = strategy
        self.delimiter = delimiter
        self.transaction = transaction
        self.heartbeat_prefix = heartbeat_prefix
        self.replacement = replacement
        self.topic_regex = topic_regex
        self.topic_replacement = topic_replacement
        self._cache: dict[tuple, str] = {}

    # -- control topics (AbstractTopicNamingStrategy:104-117) -------------

    def schema_change_topic(self) -> str:
        return self.prefix

    def heartbeat_topic(self) -> str:
        return self.delimiter.join([self.heartbeat_prefix, self.prefix])

    def transaction_topic(self) -> str:
        return self.delimiter.join([self.prefix, self.transaction])

    # -- data topics -------------------------------------------------------

    def data_change_topic(
        self,
        db: str | None = None,
        schema: str | None = None,
        table: str | None = None,
    ) -> str:
        parts = (
            [self.prefix, db, table]
            if self.strategy == "default"
            else [self.prefix, schema, table]
        )
        key = tuple(parts)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        # mkString drops null/blank parts (AbstractTopicNamingStrategy:183)
        name = self.delimiter.join(
            p for p in parts if p is not None and p.strip()
        )
        if self.topic_regex is not None:
            m = re.fullmatch(self.topic_regex, name)
            if m:
                name = m.expand(
                    re.sub(r"\$(\d+)", r"\\\1", self.topic_replacement)
                )
        out = self.sanitized_topic_name(name)
        self._cache[key] = out
        return out

    def sanitized_topic_name(self, name: str) -> str:
        valid = (
            _VALID_UNDERSCORE
            if self.replacement == "underscore"
            else _VALID_UNICODE
        )
        out = "".join(
            ch
            if valid.fullmatch(ch)
            else ("_" if self.replacement == "underscore" else _unicode_escape(ch))
            for ch in name
        )
        if len(out) > MAX_NAME_LENGTH:
            out = out[:MAX_NAME_LENGTH]
        elif out == ".":
            out = "_" if self.replacement == "underscore" else _unicode_escape(".")
        elif out == "..":
            rep = "_" if self.replacement == "underscore" else _unicode_escape(".")
            out = rep + rep
        return out


def apply_topic_names(
    df: DataFrame,
    strategy: TopicNamingStrategy,
    *,
    db_col: str = "source.db",
    table_col: str = "source.table",
    out_col: str = "topic",
) -> DataFrame:
    """Add the data-change topic name as a per-row column.

    The distinct (db, table) set is collected and named driver-side —
    the exact boundedness the reference's per-collection LRU cache
    assumes — then applied as a FLAT literal map lookup, keeping the row
    path in codegen for BOTH replacement modes (per-char unicode escaping
    is not expressible as one regexp_replace). A flat ``create_map`` is
    deliberate: a nested when/otherwise chain recurses one analyzer/
    codegen stack level per table and overflows at the thousands of
    tables a connector legitimately names; the map is one expression
    with 2n children and an O(1)-ish per-row probe.
    """
    pairs = [
        (r[0], r[1])
        for r in df.select(F.col(db_col), F.col(table_col)).distinct().collect()
    ]
    mapping = {
        (db, tb): strategy.data_change_topic(
            db=db, schema=db, table=tb
        )
        for db, tb in pairs
    }
    if not mapping:
        return df.withColumn(out_col, F.lit(None).cast("string"))
    # single-string map key; \x00 sentinel keeps NULL db/table addressable
    # and \x01 keeps ("a","b.c") distinct from ("a.b","c")
    NULL, SEP = "\x00", "\x01"

    def key_of(db, tb):
        return (NULL if db is None else db) + SEP + (NULL if tb is None else tb)

    entries = []
    for (db, tb), name in mapping.items():
        entries += [F.lit(key_of(db, tb)), F.lit(name)]
    lookup = F.create_map(*entries)[
        F.concat(
            F.coalesce(F.col(db_col), F.lit(NULL)),
            F.lit(SEP),
            F.coalesce(F.col(table_col), F.lit(NULL)),
        )
    ]
    return df.withColumn(out_col, lookup)
