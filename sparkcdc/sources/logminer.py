"""Oracle LogMiner redo rows → envelopes (closes the S8 gap).

The reference's Oracle connector mines redo logs through
``DBMS_LOGMNR``, reading ``V$LOGMINER_CONTENTS`` rows and parsing each
row's ``SQL_REDO`` — a canonical single-row INSERT/UPDATE/DELETE
statement — with a hand-written DML parser
(debezium-connector-oracle: LogMinerStreamingChangeEventSource +
LogMinerDmlParser; offset = the Oracle SCN). No Oracle server exists in
this sandbox, so the *miner session* stays out of scope — but the row
shape and the canonical redo-SQL forms are public (Oracle's LogMiner
documentation), and a Spark ingest of them is what a lake-first CDC user
runs: a tailer SELECTs V$LOGMINER_CONTENTS and ships rows as JSON to
files/Kafka, Spark parses them into envelopes and replays. Mirrors the
wal2json (S6) and change-stream (S7) adapters.

One JSON object per line, the V$LOGMINER_CONTENTS projection a tailer
ships::

    {"scn": 4768123, "operation": "INSERT", "seg_owner": "APP",
     "table_name": "EVENTS", "timestamp": "2024-01-01 00:00:00",
     "xid": "0A000B00C3040000", "row_id": "AAAR5eAAFAAAAFDAAA",
     "sql_redo": "insert into \\"APP\\".\\"EVENTS\\"(\\"USER_ID\\",...)
                  values ('42','signup',...);"}

Canonical redo-SQL forms (LogMiner always emits this shape — one row per
statement, every identifier double-quoted, every value a quoted literal
with ``''`` escaping, NULL bare, temporal values wrapped in
``TO_DATE(...)`` / ``TO_TIMESTAMP(...)``)::

    insert into "O"."T"("C1","C2") values ('v1','v2');
    update "O"."T" set "C2" = 'new' where "C1" = 'v1' and "C2" = 'old';
    delete from "O"."T" where "C1" = 'v1' and "C2" IS NULL;

Parsing is pure Catalyst: the statement structure is regular enough for
anchored regexes whose value atoms consume quoted strings atomically —
a comma or the word ``where`` INSIDE a string value cannot split a
match, because the atom pattern ``'[^']*(?:''[^']*)*'`` swallows it
atomically (unrolled-loop form — linear scan, no per-character
alternation for the backtracking regex engine to revisit). Column
lists and value lists are extracted with ``regexp_extract_all`` and
zipped; UPDATE's after-image is the old row (WHERE pairs) overridden by
the SET pairs via per-field ``map_contains_key`` lookups — no Python
UDFs, no shuffle, and no higher-order-function lambdas (those are
codegen fallbacks that block subexpression elimination, which would
re-run the regex chain once per output column).

The WHERE image depends on the database's supplemental logging level
exactly as in the reference (Debezium requires supplemental logging):
with FULL (ALL columns) the before row is complete; with minimal (PK
only) the before row is key-only — both land correctly, missing
columns are simply NULL.

op mapping: INSERT→c, UPDATE→u, DELETE→d; COMMIT/ROLLBACK/DDL and other
control operations are filtered like wal2json's B/C markers (the
reference routes DDL to the schema-history path instead — this engine's
``ddl.parse_ddl_tolerant`` plays that role on the same journal).

Offsets: the SCN is already a 64-bit position — it IS the envelope
``offset``; resume/fencing and the offset-vector algebra work unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..envelope import transaction_struct
from .wire import assemble_envelope, failure_opts, op_lookup

#: from_json schema for one shipped V$LOGMINER_CONTENTS row
LOGMINER_LINE_SCHEMA = (
    "struct<scn:bigint,operation:string,seg_owner:string,"
    "table_name:string,`timestamp`:string,xid:string,row_id:string,"
    "sql_redo:string>"
)

_OP = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}

#: one redo value literal, consumed atomically: a quoted string with ''
#: escapes, NULL, or a TO_DATE/TO_TIMESTAMP('...', 'fmt') wrapper
_STR = r"'[^']*(?:''[^']*)*'"  # unrolled-loop form: no per-char alternation
_ATOM = rf"(?:{_STR}|NULL|TO_(?:DATE|TIMESTAMP)\s*\(\s*{_STR}\s*(?:,\s*{_STR}\s*)?\))"
_NAME = r'"([A-Za-z0-9_#$]+)"'
#: "COL" = <atom>  |  "COL" IS NULL   (WHERE images use IS NULL);
#: capturing form (groups: 1=name, 2=value) and non-capturing form for
#: building sequence patterns
_PAIR = rf'{_NAME}\s*(?:=\s*({_ATOM})|IS\s+NULL)'
_ATOM_NC = _ATOM
_PAIR_NC = rf'"[A-Za-z0-9_#$]+"\s*(?:=\s*{_ATOM_NC}|IS\s+NULL)'
#: SET pair-list (comma-joined) and WHERE pair-list (and-joined)
_SET_SEQ = rf"{_PAIR_NC}(?:\s*,\s*{_PAIR_NC})*"
_WHERE_SEQ = rf"{_PAIR_NC}(?:\s+and\s+{_PAIR_NC})*"
#: whole-statement validity checks (anchored): ONE rlike scan decides
#: parseability, so the parse_ok FILTER never re-derives the pair maps
#: — matching these implies the segment extractions below succeed
_UPD_STMT = rf"(?is)^\s*update\s+\S+\s+set\s+{_SET_SEQ}\s+where\s+{_WHERE_SEQ}\s*;?\s*$"
_DEL_STMT = rf"(?is)^\s*delete\s+from\s+\S+\s+where\s+{_WHERE_SEQ}\s*;?\s*$"


def _unquote(v):
    """Redo literal → plain string value: NULL/absent → null; TO_DATE/
    TO_TIMESTAMP keeps its first argument; '' unescapes to '. The
    wrapper match is ANCHORED to the literal's start — a value merely
    containing the text TO_DATE( inside its quotes must not trip it."""
    inner = F.regexp_extract(v, rf"(?is)^TO_(?:DATE|TIMESTAMP)\s*\(\s*({_STR})", 1)
    s = F.when(inner != "", inner).otherwise(v)
    return F.when(
        # upper(): a bare lowercase null matches the (?i) atom grammar,
        # so the bare-NULL check must be case-insensitive too (a QUOTED
        # 'null' keeps its quotes here and is not affected)
        v.isNull() | (v == "") | (F.upper(v) == "NULL"),
        F.lit(None).cast("string"),
    ).otherwise(
        F.regexp_replace(
            F.regexp_extract(s, r"^'([^']*(?:''[^']*)*)'$", 1), "''", "'"
        )
    )


def _pairs_to_map(seg):
    """A SET/WHERE pair segment → map<name, RAW value literal> (an IS
    NULL pair's unmatched value group lands as '' → :func:`_unquote`
    yields NULL). Values stay quoted here on purpose: unquoting happens
    per field AFTER the map lookup (:func:`_typed_row`), so this subtree
    contains NO lambda — higher-order functions (``transform`` /
    ``map_zip_with``) force interpreted (non-codegen) evaluation of the
    whole expression. The map is materialized once per row as a staged
    column (see :func:`logminer_to_envelopes`) however many fields look
    it up."""
    # (?is) so the pair scan accepts the same case spectrum the
    # whole-statement parse_ok gates admit (lowercase to_date/null/is
    # null) — a case mismatch here would pass the gate but extract
    # wrongly, the silent-loss class the gate exists to prevent
    names = F.regexp_extract_all(seg, F.lit("(?is)" + _PAIR), 1)
    vals = F.regexp_extract_all(seg, F.lit("(?is)" + _PAIR), 2)
    return F.map_from_arrays(names, vals)


def _typed_row(m, row_fields: list[tuple[str, T.DataType]]):
    """Raw-literal map → typed row struct (unquote per field, post-lookup)."""
    return F.struct(*[
        _unquote(F.element_at(m, F.lit(n.upper()))).cast(t).alias(n)
        for n, t in row_fields
    ])


def logminer_to_envelopes(
    lines: DataFrame,
    row_fields: list[tuple[str, T.DataType]],
    key_cols: list[str],
    *,
    table: str | None = None,
    owner: str | None = None,
    n_parts: int = 8,
    line_col: str = "value",
    source_name: str = "sparkcdc",
    failure_handling: str = "skip",
) -> DataFrame:
    """Parse shipped V$LOGMINER_CONTENTS rows into the envelope schema.

    ``table`` / ``owner`` filter to one captured table (TABLE_NAME /
    SEG_OWNER are upper-case in the view, compared as given). Control
    operations (COMMIT/ROLLBACK/DDL/...) drop here. Works unmodified on
    a streaming DataFrame (stateless projections only)."""
    opts = failure_opts(failure_handling)
    j = F.from_json(F.col(line_col), LOGMINER_LINE_SCHEMA, opts).alias("j")
    work = lines.select(j).select("j.*").filter(
        F.col("operation").isin(*_OP)
    )
    if table is not None:
        work = work.filter(F.col("table_name") == table)
    if owner is not None:
        work = work.filter(F.col("seg_owner") == owner)

    redo = F.col("sql_redo")
    # INSERT: zip the quoted column list with the values list. The value
    # atoms are matched structurally, so commas inside strings survive.
    ins_names = F.regexp_extract_all(
        F.regexp_extract(redo, r"(?i)^\s*insert\s+into\s+[^(]+\(([^)]*)\)", 1),
        F.lit(_NAME), 1,
    )
    ins_vals = F.regexp_extract_all(
        F.regexp_extract(
            redo, rf"(?is)values\s*\(\s*({_ATOM_NC}(?:\s*,\s*{_ATOM_NC})*)\s*\)", 1
        ),
        # (?is) like the segment extract above it: a lowercase
        # to_date(...) must stay ONE atom (case-sensitive, it would
        # split into its two string arguments and silently misalign the
        # zip when a bare lowercase null hides the count mismatch)
        F.lit(f"(?is)({_ATOM_NC})"), 1,
    )
    # guard the zip: a values list containing a literal outside the atom
    # grammar (e.g. EMPTY_CLOB()) extracts fewer atoms than names — the
    # map must not be built then (map_from_arrays throws), the row is
    # invalid instead (handled below per failure_handling)
    ins_ok = (F.size(ins_names) > 0) & (F.size(ins_names) == F.size(ins_vals))
    # raw-literal map, same no-lambda rationale as _pairs_to_map
    ins_map = F.when(ins_ok, F.map_from_arrays(ins_names, ins_vals))
    # UPDATE: SET pairs then WHERE pairs, both matched as structured
    # sequences anchored on the real keywords (a literal ' where ' inside
    # a value sits inside an atom and cannot terminate the SET sequence)
    set_map = _pairs_to_map(F.regexp_extract(
        redo, rf"(?is)\bset\s+({_SET_SEQ})\s+where\s", 1))
    where_map = _pairs_to_map(F.regexp_extract(
        redo, rf"(?is)\bwhere\s+({_WHERE_SEQ})\s*;?\s*$", 1))

    op = op_lookup(_OP, F.col("operation"))
    is_ins = F.col("operation") == "INSERT"
    is_upd = F.col("operation") == "UPDATE"
    # a DML row whose redo misses the canonical grammar (ROWID-only
    # predicates, unsupported literals) must not emerge as a null-key
    # envelope: skip drops it, fail aborts the batch naming the redo.
    # The gate runs BEFORE the map-staging projection and decides with
    # ONE anchored whole-statement rlike per row (op-gated CASE WHEN),
    # so it never re-derives the pair maps — a filter placed above the
    # staging projection instead gets predicate-pushed below it with the
    # map expressions substituted back in, doubling the regex work (the
    # INSERT branch keeps the exact arity check; matching _UPD/_DEL_STMT
    # implies the segment extractions below succeed).
    parse_ok = (
        F.when(is_ins, ins_ok)
        .when(is_upd, F.col("sql_redo").rlike(_UPD_STMT))
        .otherwise(F.col("sql_redo").rlike(_DEL_STMT))
    )
    if failure_handling == "fail":
        # raising INSIDE the filter condition: the predicate must be
        # evaluated per row, so it cannot be pruned away
        work = work.filter(
            F.when(parse_ok, F.lit(True)).otherwise(
                F.raise_error(F.concat(
                    F.lit("unparseable LogMiner redo: "), redo))
            )
        )
    else:
        work = work.filter(parse_ok)
    # STAGE the three maps as real columns in their own projection,
    # each gated on its op so an INSERT row never runs the UPDATE
    # regexes (CASE WHEN branches evaluate lazily per row). The typed
    # rows below look these columns up once per field — CollapseProject
    # refuses to inline a non-cheap alias referenced more than once, so
    # the two projections stay separate and each regex chain executes
    # ONCE per row. Inlining everything into one projection instead
    # blows the JVM's 64KB generated-method limit (whole-stage codegen
    # falls back to interpreted evaluation, which has no subexpression
    # elimination → every field re-runs the full chain; measured 62s vs
    # 4.5s for the staged form on the sf0.1 parse, 32-way).
    #
    # Known residual (documented, accepted): Catalyst's predicate
    # pushdown substitutes the from_json chain into the filter it sinks
    # to the scan — PushDownPredicates has no duplicate-expensive-
    # expression guard — so the wire line is parsed ~2× per row. The
    # barrier alternatives (non-deterministic guard, an Exchange, a
    # Python round-trip) all cost more than the duplication.
    work = work.select(
        "*",
        F.when(is_ins & ins_ok, ins_map).alias("_ins_map"),
        F.when(is_upd, set_map).alias("_set_map"),
        F.when(~is_ins, where_map).alias("_where_map"),
    )
    m_ins, m_set, m_where = (
        F.col("_ins_map"), F.col("_set_map"), F.col("_where_map"))
    # after-image: insert = the values list; update = old row (WHERE
    # pairs) overridden by the SET pairs, decided per field with
    # map_contains_key (not coalesce), so an explicit SET-to-NULL nulls
    # the column instead of resurrecting the old value.
    upd_row = F.struct(*[
        _unquote(
            F.when(
                F.map_contains_key(m_set, F.lit(n.upper())),
                F.element_at(m_set, F.lit(n.upper())),
            ).otherwise(F.element_at(m_where, F.lit(n.upper())))
        ).cast(t).alias(n)
        for n, t in row_fields
    ])
    after = F.when(is_ins, _typed_row(m_ins, row_fields)).when(
        is_upd, upd_row
    )
    before = F.when(
        F.col("operation").isin("UPDATE", "DELETE"),
        _typed_row(m_where, row_fields),
    )
    key = [F.coalesce(after[c], before[c]) for c in key_cols]
    ts_ms = F.expr("unix_micros(cast(`timestamp` as timestamp)) div 1000")
    src = F.struct(
        F.lit(source_name).alias("name"),
        F.col("seg_owner").alias("db"),
        F.col("table_name").alias("table"),
        F.lit("false").alias("snapshot"),
        F.col("row_id").alias("file"),
        F.col("scn").alias("pos"),
        F.lit(None).cast("int").alias("row"),
        F.col("xid").alias("gtid"),
        ts_ms.alias("ts_ms"),
    )
    txn = F.when(
        F.col("xid").isNotNull(),
        F.struct(
            F.col("xid").alias("id"),
            F.lit(None).cast("long").alias("total_order"),
            F.lit(None).cast("long").alias("data_collection_order"),
        ),
    ).cast(transaction_struct())
    return assemble_envelope(
        work, op=op, ts_ms=ts_ms, before=before, after=after,
        source=src, transaction=txn, key=key,
        offset=F.col("scn"), n_parts=n_parts,
    )


def events_to_logminer_rows(
    events: DataFrame,
    *,
    owner: str = "APP",
    table: str = "EVENTS",
) -> DataFrame:
    """Deterministic LogMiner emitter over the driver's ``events`` table
    — the synthetic V$LOGMINER_CONTENTS feed for tests/benchmarks (the
    role DBMS_LOGMNR plays server-side). One INSERT/UPDATE/DELETE redo
    statement per event (op per events_adapter.OP_MAP), SCN = event_id,
    XID = zero-padded hex over event_id. The WHERE image is the primary
    key (minimal supplemental logging — the PK-only level); values are
    quoted with ``''`` escaping exactly as LogMiner renders them, so
    props containing quotes exercise the unescaper."""
    q = lambda c: F.concat(  # noqa: E731 — LogMiner literal quoting
        F.lit("'"), F.regexp_replace(c.cast("string"), "'", "''"), F.lit("'")
    )
    lit_or_null = lambda c: F.coalesce(q(c), F.lit("NULL"))  # noqa: E731
    ident = f'"{owner}"."{table}"'
    uid = q(F.col("user_id").cast("long"))
    ins = F.concat(
        F.lit(f'insert into {ident}("USER_ID","EVENT_TYPE","VALUE","PROPS")'
              " values ("),
        uid, F.lit(","), lit_or_null(F.col("event_type")), F.lit(","),
        lit_or_null(F.col("value").cast("double")), F.lit(","),
        lit_or_null(F.col("props")), F.lit(");"),
    )
    upd = F.concat(
        F.lit(f'update {ident} set "EVENT_TYPE" = '),
        lit_or_null(F.col("event_type")),
        F.lit(', "VALUE" = '), lit_or_null(F.col("value").cast("double")),
        F.lit(', "PROPS" = '), lit_or_null(F.col("props")),
        F.lit(' where "USER_ID" = '), uid, F.lit(";"),
    )
    dele = F.concat(
        F.lit(f'delete from {ident} where "USER_ID" = '), uid, F.lit(";"),
    )
    redo = (
        F.when(F.col("event_type") == "signup", ins)
        .when(F.col("event_type") == "error", dele)
        .otherwise(upd)
    )
    opn = (
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )
    doc = F.struct(
        F.col("event_id").cast("long").alias("scn"),
        opn.alias("operation"),
        F.lit(owner).alias("seg_owner"),
        F.lit(table).alias("table_name"),
        F.date_format(F.col("ts").cast("timestamp"),
                      "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
        F.lpad(F.hex(F.col("event_id")), 16, "0").alias("xid"),
        F.concat(F.lit("AAAR5eAAF"),
                 F.lpad(F.col("event_id").cast("string"), 9, "0")
                 ).alias("row_id"),
        redo.alias("sql_redo"),
    )
    return events.select(F.to_json(doc).alias("value"))
