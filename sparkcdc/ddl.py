"""DDL-string schema-change capture: a pragmatic MySQL-flavored DDL parser
producing TableChanges-style dicts that feed :meth:`LakeTable.evolve` and
the schema history journal.

Reference: Debezium parses real DDL from the binlog with a full ANTLR
grammar (debezium-ddl-parser/, BinlogAntlrDdlParserTest.java; corpora at
debezium-ddl-parser/src/test/resources/mysql/examples/*.sql) into
``TableChanges`` (core/relational/history/TableChanges.java:92,208-211 —
CREATE/ALTER/DROP, rename carried as ALTER with previousId). This module
covers the subset a lake sink can act on — CREATE TABLE, ALTER TABLE
ADD/RENAME/CHANGE/MODIFY/DROP COLUMN, RENAME/DROP/TRUNCATE TABLE — with
the same output shape; anything else raises ``UnsupportedDdl`` so callers
can journal-and-skip like the reference's non-table DDL events.

The grammar subset is hand-written (regex + split) on purpose: the engine
needs exactly the statements that change a captured table's shape, and the
reference's 10k-line grammar mostly handles dialect noise a lake sink
ignores (engines, charsets, index options).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

#: MySQL type name → lake manifest type (suffix attribute noise —
#: unsigned/zerofill — folded into the patterns so ``int unsigned``
#: still widens while ``float unsigned zerofill`` maps cleanly)
_TYPE_MAP = [
    (r"tinyint\s*\(\s*1\s*\)|bool(ean)?", "boolean"),
    (r"(tiny|small|medium|middle)?int(eger)?[1-48]?(\s*\(\d+\))?(\s+unsigned)?(\s+zerofill)?", None),  # int-ish, see below
    (r"bigint(\s*\(\d+\))?(\s+unsigned)?(\s+zerofill)?|serial", "long"),
    (r"float(\s*\(\d+(,\s*\d+)?\))?(\s+unsigned)?(\s+zerofill)?", "float"),
    (r"(double|real)(\s+precision)?(\s*\(\d+(,\s*\d+)?\))?(\s+unsigned)?(\s+zerofill)?", "double"),
    (r"(decimal|numeric|dec|fixed)(\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?(\s+unsigned)?(\s+zerofill)?", "decimal"),
    (r"(national\s+)?(var)?char(acter)?(\s+varying)?(\s*\(\d+\))?"
     r"|n(var)?char(\s+varying)?(\s*\(\d+\))?"
     r"|(tiny|medium|long)?text(\s*\(\d+\))?|enum\s*\(.*?\)|set\s*\(.*?\)|json|uuid|inet[46]", "string"),
    (r"(var)?binary(\s*\(\d+\))?|(tiny|medium|long)?blob(\s*\(\d+\))?|vector(\s*\(\d+\))?"
     r"|point|geometry|linestring|polygon|multipoint|multilinestring"
     r"|multipolygon|geometrycollection|geomcollection", "binary"),
    (r"datetime(\s*\(\d+\))?|timestamp(\s*\(\d+\))?"
     r"(\s+with(\s+local)?\s+time\s+zone)?", "timestamp"),
    (r"date", "date"),
    (r"time(\s*\(\d+\))?|year(\s*\(\d+\))?|bit(\s*\(\d+\))?", "long"),
    # -- Oracle dialect (the LogMiner redo-DDL journal path; corpus:
    #    debezium-ddl-parser/src/test/resources/oracle/examples) --------
    (r"(n)?varchar2(\s*\(\s*\d+(\s+(char|byte))?\s*\))?"
     r"|(n)?char(\s*\(\s*\d+(\s+(char|byte))?\s*\))?"
     r"|(n)?clob|long(\s+varchar)?|xmltype|rowid|urowid(\s*\(\d+\))?"
     r"|(sys\.)?anydata|interval\s+year(\s*\(\d+\))?\s+to\s+month"
     r"|interval\s+day(\s*\(\d+\))?\s+to\s+second(\s*\(\d+\))?", "string"),
    # NUMBER(p[,s]) -> decimal (negative/star scales clamp to 0 below);
    # bare/star-precision NUMBER is variable-scale -> double
    (r"number\s*\(\s*(\d+)\s*(?:,\s*(-?\d+)\s*)?\)", "decimal"),
    (r"number(\s*\(\s*\*\s*(,\s*-?\d+\s*)?\))?|binary_double", "double"),
    (r"binary_float", "float"),
    (r"(long\s+)?raw(\s*\(\d+\))?|bfile"
     r"|sdo_geometry|sdo_topo_geometry|sdo_georaster", "binary"),
]


class UnsupportedDdl(ValueError):
    """Statement outside the supported subset (callers journal + skip)."""


def map_type(sql_type: str) -> str:
    s = sql_type.strip().lower()
    for pat, t in _TYPE_MAP:
        m = re.fullmatch(pat, s)
        if m:
            if t == "decimal":
                nums = [g for g in m.groups() if g and g.isdigit()]
                p = nums[0] if nums else "10"  # MySQL defaults: (10,0)
                sc = nums[1] if len(nums) > 1 else "0"
                return f"decimal({p},{sc})"
            if t is None:  # int family: unsigned ints widen (SURVEY §2.7)
                if "bigint" in s:
                    return "long"
                # MySQL INT8 is an alias for BIGINT (INT1..INT4 are the
                # 8/16/24/32-bit aliases and fit in 'int').
                if re.match(r"int(eger)?8\b", s):
                    return "long"
                return "long" if "unsigned" in s else "int"
            return t
    raise UnsupportedDdl(f"unmapped SQL type: {sql_type!r}")


@dataclass
class TableChange:
    """One parsed statement — the TableChanges.java entry analog."""

    type: str  # CREATE | ALTER | DROP | TRUNCATE | RENAME
    table: str
    previous_table: str | None = None  # RENAME: old id (previousId analog)
    fields: list[tuple[str, str]] = field(default_factory=list)  # CREATE
    key_cols: list[str] = field(default_factory=list)  # CREATE
    changes: list[dict] = field(default_factory=list)  # ALTER → evolve dicts


def _ident(s: str) -> str:
    # normalize per dotted part: Oracle redo SQL writes '"SYSTEM".
    # LOGMNR_ATTRCOL$' (quoted schema, whitespace around the dot)
    parts = re.split(r"\s*\.\s*", s.strip())
    return ".".join(p.strip("`\"'") for p in parts if p)


def _split_top_level(s: str, delim: str = ",") -> list[str]:
    """Split on ``delim`` outside parens AND outside quoted literals
    (``DEFAULT 'a,b'`` / ``COMMENT 'x; y'`` must stay one item)."""
    out, depth, cur = [], 0, []
    quote: str | None = None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == delim and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


_COL_STOPWORDS = re.compile(
    # DEFAULT takes a quoted literal, a (possibly nested-once) call or
    # parenthesized expression — CAST(NOW() AS DATE), (a * b) — or a token
    r"\s+(not\s+null|null"
    r"|default\s+(\w+\s*)?\((?:[^()]|\([^()]*\))*\)"
    r"|default\s+('[^']*'|\S+)|auto_increment"
    r"|comment\s+'[^']*'"
    r"|primary\s+key|unique|collate\s+\S+|character\s+set\s+\S+"
    r"|charset\s+\S+"
    # attribute/position noise a lake schema ignores: column placement,
    # generated columns (the STORED/VIRTUAL expression is source-side;
    # the sink sees materialized values), inline FK/CHECK, visibility,
    # storage hints, ON UPDATE actions, charset BINARY attribute
    r"|first$|after\s+[`\"]?\w+[`\"]?"
    r"|(generated\s+always\s+)?as\s+\(.*\)\s*(stored|virtual|persistent)?"
    r"|references\s+.*$|check\s*\(.*\)(\s+(not\s+)?enforced)?"
    r"|on\s+update\s+\S+(\s*\(\d*\))?"
    r"|invisible|visible|srid\s+\d+|zerofill"
    r"|column_format\s+(fixed|dynamic|default)|storage\s+(disk|memory)"
    # Oracle tails: a second uncomma'd ADD CONSTRAINT/FK clause after the
    # column def, constraint states, annotation clauses
    r"|add\s+(constraint|foreign\s+key|primary\s+key|unique|check)\b.*$"
    r"|enable(\s+novalidate)?$|disable$|annotations\s*\((?:[^()]|\([^()]*\))*\)"
    r"|binary(?!\s*\())",
    re.I,
)

#: a CREATE TABLE item that is an index/constraint, NOT a column def.
#: Keywords must be whole words followed by whitespace/paren — a column
#: merely named ``checksum``/``indexed``/``uniqueid`` is a column.
_CONSTRAINT_ITEM = re.compile(
    r"(primary\s+key|foreign\s+key|unique(\s+key|\s+index)?"
    r"|fulltext(\s+key|\s+index)?|spatial(\s+key|\s+index)?"
    r"|clustering\s+key"
    r"|key|index|constraint|check)\s*[\s(]",
    re.I,
)


#: one CREATE TABLE matcher, shared by every consumer (parse_ddl and
#: raw_column_types must accept the same statements or the type catalog
#: silently diverges from the evolution path)
_CREATE_RE = re.compile(
    r"create\s+table\s+(if\s+not\s+exists\s+)?([`\"\w.]+)\s*\((.*)\)[^)]*$",
    re.I | re.S,
)


def _create_items(body: str):
    """Yield ``(kind, item)`` per top-level CREATE item: ``'pk'`` for the
    table-level PRIMARY KEY clause, ``'col'`` for a column definition;
    index/constraint noise a lake sink ignores is skipped."""
    for item in _split_top_level(body):
        item = item.strip()
        if item.lower().startswith("primary key"):
            yield "pk", item
        elif not _CONSTRAINT_ITEM.match(item):
            yield "col", item


def _parse_create(body: str, table: str) -> TableChange:
    fields, keys = [], []
    for kind, item in _create_items(body):
        if kind == "pk":
            inner = item[item.find("(") + 1 : item.rfind(")")]
            keys = [_ident(c) for c in inner.split(",")]
            continue
        m = re.match(r"[`\"]?(\w+)[`\"]?\s+(.+)", item, re.S)
        if not m:
            raise UnsupportedDdl(f"unparsable column def: {item!r}")
        name, rest = m.group(1), m.group(2)
        if re.search(r"\bprimary\s+key\b", rest, re.I):
            keys.append(name)
        rest = _COL_STOPWORDS.sub("", rest).strip()
        fields.append((name, map_type(rest)))
    return TableChange(type="CREATE", table=table, fields=fields, key_cols=keys)


#: ALTER clauses that change nothing a lake sink stores — indexes,
#: constraints, partitions, table options, charsets, visibility,
#: default tweaks. The reference's grammar parses all of these and its
#: sink ignores them (JdbcChangeEventSink reacts only to column-shape
#: changes); recognizing them as explicit no-ops keeps a captured
#: table's REAL ALTERs out of the journal-and-skip path.
_NOOP_ALTER = re.compile(
    r"""(?ix)^(
      add \s+ ( constraint\b | (unique|fulltext|spatial) (\s+(key|index))? \b
              | primary\s+key\b | foreign\s+key\b | (key|index)\b | check\b
              | partition\b )
    | drop \s+ ( (index|key|constraint|check|partition)\b | primary\s+key\b
               | foreign\s+key\b )
    | alter \s+ (index|check)\b
    | alter \s+ (column\s+)? [`"]?\w+[`"]? \s+
        ( set\s+(default|visible|invisible)\b | drop\s+default\b )
    | rename \s+ (index|key)\b
    | (default\s+)? (character\s+set|charset|collate)\b
    | convert \s+ to \s+ (character\s+set|charset)\b
    | collate\s*=
    | ( engine | auto_increment | avg_row_length | checksum | comment
      | compression | connection | delay_key_write | encryption
      | insert_method | key_block_size | max_rows | min_rows | pack_keys
      | password | row_format | stats_auto_recalc | stats_persistent
      | stats_sample_pages | tablespace | union | algorithm | lock
      | storage ) \s* =?
    | (enable|disable)\s+keys\b
    | force\b
    | order\s+by\b
    | (discard|import)\s+tablespace\b
    | (coalesce|analyze|check|optimize|rebuild|repair|truncate|exchange
      |reorganize|remove)\s+partition(ing)?\b
    | partition\s+by\b
    | with(out)?\s+validation\b
    )""",
)

#: ALTER tails that must be recognized as no-ops BEFORE comma splitting:
#: Oracle partition maintenance takes comma-separated partition-name
#: lists ("DROP PARTITION p0, p1") and INTO-lists whose items are not
#: ALTER clauses at all; storage/annotation clauses likewise span the
#: whole tail (corpus: oracle/examples/ddl_alter.sql).
_WHOLE_ALTER_NOOP = re.compile(
    r"""(?ix)^(
      (add|drop|truncate|coalesce|exchange|merge|split|rename|move|modify)
        \s+ (sub)?partition\b
    | move\b | shrink\s+space\b | allocate\s+extent\b
    | deallocate\s+unused\b | (no)?logging\b | (no)?parallel\b
    | (no\s+)?inmemory\b | read\s+(only|write)\b
    | (enable|disable)\s+(row\s+movement|all\s+triggers|constraint)\b
    | annotations\s*\(
    | (add|drop)\s+supplemental\s+log\b
    | add\s+xmltype\s*$
    | (pctfree|pctused|initrans|storage)\b
    | set\s+interval\b
    | (no\s+)?memoptimize\b
    )""",
)


def _parse_alter_item(item: str, current_types: dict[str, str] | None) -> list[dict]:
    item = item.strip()
    low = item.lower()
    if _NOOP_ALTER.match(item):
        return []  # schema-irrelevant clause: parsed, nothing to evolve
    # parenthesized multi-column add: ADD [COLUMN] (c1 t1, c2 t2, ...)
    if m := re.match(
        r"add\s+(column\s+)?(if\s+not\s+exists\s+)?\((.*)\)$", item, re.I | re.S
    ):
        out = []
        for sub in _split_top_level(m.group(3)):
            out.extend(_parse_alter_item(f"add column {sub.strip()}",
                                         current_types))
        return out
    if m := re.match(
        r"add\s+(column\s+)?(if\s+not\s+exists\s+)?[`\"]?(\w+)[`\"]?\s+(.+)",
        item, re.I | re.S,
    ):
        return _parse_add_column(m.group(3), m.group(4))
    if m := re.match(r"rename\s+column\s+[`\"]?(\w+)[`\"]?\s+to\s+[`\"]?(\w+)[`\"]?", item, re.I):
        return [{"action": "rename", "from": m.group(1), "to": m.group(2)}]
    if m := re.match(
        r"change\s+(column\s+)?(if\s+exists\s+)?"
        r"[`\"]?(\w+)[`\"]?\s+[`\"]?(\w+)[`\"]?\s+(.+)",
        item, re.I | re.S,
    ):
        old, new, rest = m.group(3), m.group(4), m.group(5)
        rest = _COL_STOPWORDS.sub("", rest).strip()
        new_type = map_type(rest)
        out = []
        if old != new:
            out.append({"action": "rename", "from": old, "to": new})
        if current_types is not None and current_types.get(old) not in (None, new_type):
            out.append({"action": "widen", "name": new, "type": new_type})
        return out
    # parenthesized multi-column modify (Oracle): MODIFY (c1 t1, c2 t2)
    if m := re.match(r"modify\s*\((.*)\)$", item, re.I | re.S):
        out = []
        for sub in _split_top_level(m.group(1)):
            out.extend(_parse_alter_item(f"modify {sub.strip()}",
                                         current_types))
        return out
    if m := re.match(
        r"modify\s+(column\s+)?(if\s+exists\s+)?[`\"]?(\w+)[`\"]?\s+(.+)",
        item, re.I | re.S,
    ):
        # pad so an attribute-only rest ("DEFAULT NULL", "INVISIBLE",
        # "annotations (...)") matches the \s+-anchored stopwords
        rest = _COL_STOPWORDS.sub("", " " + (m.group(4) or "")).strip()
        name = m.group(3)
        if not rest:
            # attribute-only MODIFY (DEFAULT/NULL/visibility/annotations):
            # no column-shape change for the sink
            return []
        new_type = map_type(rest)
        if current_types is not None and current_types.get(name) == new_type:
            return []  # nullability/default tweak only
        return [{"action": "widen", "name": name, "type": new_type}]
    if m := re.match(
        r"drop\s+(column\s+)?(if\s+exists\s+)?[`\"]?(\w+)[`\"]?$", item, re.I
    ):
        return [{"action": "drop", "name": m.group(3)}]
    raise UnsupportedDdl(f"unsupported ALTER clause: {item!r}")


def _parse_add_column(name: str, rest: str) -> list[dict]:
    dm = re.search(r"default\s+('([^']*)'|\S+)", rest, re.I)
    default = None
    if dm:
        default = dm.group(2) if dm.group(2) is not None else dm.group(1)
        if isinstance(default, str) and default.lower() in ("null",):
            default = None
    rest = _COL_STOPWORDS.sub("", rest).strip()
    out = {"action": "add", "name": name, "type": map_type(rest)}
    if default is not None:
        ty = out["type"]
        out["default"] = (
            int(default) if ty in ("int", "long")
            else float(default) if ty in ("float", "double")
            else default
        )
    return [out]


def parse_ddl(
    sql: str, current_types: dict[str, str] | None = None
) -> list[TableChange]:
    """Parse one-or-more ``;``-separated DDL statements.

    ``current_types`` (column → manifest type of the captured table) lets
    CHANGE/MODIFY distinguish a real type widen from a constraint tweak —
    the reference resolves this against its in-memory ``Tables`` catalog.
    """
    out = []
    for stmt in _split_top_level(sql, ";"):
        stmt = re.sub(r"\s+", " ", stmt.strip())
        if not stmt:
            continue
        low = stmt.lower()
        # strip a trailing PARTITION BY layout spec before the body match:
        # _CREATE_RE's greedy body capture would otherwise swallow the
        # partition clause's parens into the column list (partitioning is
        # source-side storage layout; the sink has its own bucketing)
        create_stmt = re.sub(
            r"(?is)\s+partition\s+by\s+.*$", "", stmt
        ) if low.startswith("create") else stmt
        if m := _CREATE_RE.match(create_stmt):
            out.append(_parse_create(m.group(3), _ident(m.group(2))))
        elif m := re.match(
            r"alter\s+(ignore\s+)?(online\s+|offline\s+)?table\s+"
            r"(if\s+exists\s+)?((?:[`\"\w$]+\s*\.\s*)*[`\"\w$]+)\s+"
            r"(?:(?:no)?wait(\s+\d+)?\s+)?(.*)$",
            stmt, re.I | re.S,
        ):
            table, rest = _ident(m.group(4)), m.group(6)
            if rm := re.match(r"rename\s+(to\s+)?[`\"]?([\w.$]+)[`\"]?$", rest, re.I):
                out.append(TableChange(type="RENAME", table=_ident(rm.group(2)),
                                       previous_table=table))
                continue
            changes = []
            if not _WHOLE_ALTER_NOOP.match(rest.strip()):
                for item in _split_top_level(rest):
                    changes.extend(_parse_alter_item(item, current_types))
            out.append(TableChange(type="ALTER", table=table, changes=changes))
        elif m := re.match(r"rename\s+table\s+([`\"\w.]+)\s+to\s+([`\"\w.]+)", stmt, re.I):
            out.append(TableChange(type="RENAME", table=_ident(m.group(2)),
                                   previous_table=_ident(m.group(1))))
        elif m := re.match(r"drop\s+table\s+(if\s+exists\s+)?([`\"\w.]+)", stmt, re.I):
            out.append(TableChange(type="DROP", table=_ident(m.group(2))))
        elif m := re.match(r"truncate\s+(table\s+)?([`\"\w.]+)", stmt, re.I):
            out.append(TableChange(type="TRUNCATE", table=_ident(m.group(2))))
        else:
            raise UnsupportedDdl(f"unsupported statement: {stmt[:80]!r}")
    return out


#: best-effort table identifier of a statement, for pre-parse filtering
_STMT_TABLE = re.compile(
    r"(?:create\s+table\s+(?:if\s+not\s+exists\s+)?"
    r"|alter\s+(?:ignore\s+)?(?:online\s+|offline\s+)?table\s+"
    r"(?:if\s+exists\s+)?"
    r"|drop\s+table\s+(?:if\s+exists\s+)?"
    r"|truncate\s+(?:table\s+)?|rename\s+table\s+)"
    r"((?:[`\"\w$]+\s*\.\s*)*[`\"\w$]+)",
    re.I,
)


def statement_table(stmt: str) -> str | None:
    """The table a single DDL statement addresses, or None if the statement
    shape is unknown (SET/ANALYZE/CREATE INDEX/...)."""
    m = _STMT_TABLE.match(stmt.strip())
    return _ident(m.group(1)) if m else None


def parse_ddl_tolerant(
    sql: str,
    current_types: dict[str, str] | None = None,
    *,
    only_table: str | None = None,
) -> tuple[list[TableChange], list[tuple[str, str]]]:
    """Per-statement parse-and-filter — the engine's binlog-DDL path.

    A binlog DDL string carries EVERY table's statements plus dialect noise
    (CREATE INDEX, SET, ANALYZE ...). The reference journals-and-skips each
    unsupported statement individually (one HistoryRecord per statement,
    core/relational/history/SchemaHistory); an all-or-nothing parse would
    drop a valid ALTER for the captured table because an unrelated statement
    failed. ``only_table`` drops statements addressed to OTHER tables BEFORE
    their clauses are parsed, so another table's CHANGE/MODIFY is never
    resolved against this table's column catalog.

    Returns ``(changes, skipped)`` where skipped is
    ``[(statement, error), ...]`` for journal-and-skip reporting.
    """
    out: list[TableChange] = []
    skipped: list[tuple[str, str]] = []
    for stmt in _split_top_level(sql, ";"):
        stmt = re.sub(r"\s+", " ", stmt.strip())
        if not stmt:
            continue
        if only_table is not None:
            target = statement_table(stmt)
            if target is not None and target.split(".")[-1] != only_table:
                continue  # another table's DDL: not ours to act on
        try:
            out.extend(parse_ddl(stmt, current_types=current_types))
        except UnsupportedDdl as e:
            skipped.append((stmt, str(e)))
    return out, skipped


def apply_ddl(table, sql: str) -> list[TableChange]:
    """Parse ``sql`` and apply ALTERs addressed to ``table`` via
    :meth:`LakeTable.evolve` (the DDL → TableChanges → sink-evolution
    pipeline of SchemaHistory.record + JdbcChangeEventSink auto-ALTER).
    Returns the parsed changes (for journaling)."""
    m = table.manifest()
    current = {f.name: f.type for f in m.fields}
    parsed = parse_ddl(sql, current_types=current)
    for tc in parsed:
        if tc.type == "ALTER" and tc.changes:
            table.evolve(tc.changes)
    return parsed


def raw_column_types(sql: str, table: str | None = None) -> dict[str, dict]:
    """Extract each column's ORIGINAL database type (name, length, scale)
    from a CREATE TABLE statement, for ``column.propagate.source.type``
    propagation (the reference reads these off JDBC/parsed-DDL column
    metadata — Column.typeName()/length()/scale() — before they are
    normalized to connect types; here :func:`map_type` is the normalizer,
    so the raw spelling must be captured separately).

    Returns ``{column: {"type": "VARCHAR", "length": 255, "scale": None}}``
    for the first CREATE addressing ``table`` (any CREATE when ``table`` is
    None). Statements that are not CREATEs are skipped; an absent table
    yields ``{}``.
    """
    for stmt in _split_top_level(sql, ";"):
        stmt = re.sub(r"\s+", " ", stmt.strip())
        m = _CREATE_RE.match(stmt)
        if not m:
            continue
        name = _ident(m.group(2))
        if table is not None and name.split(".")[-1] != table.split(".")[-1]:
            continue
        out: dict[str, dict] = {}
        for kind, item in _create_items(m.group(3)):
            if kind != "col":
                continue
            cm = re.match(r"[`\"]?(\w+)[`\"]?\s+(\w+)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?", item)
            if not cm:
                continue
            col, typ, length, scale = cm.groups()
            out[col] = {
                "type": typ.upper(),
                "length": int(length) if length is not None else None,
                "scale": int(scale) if scale is not None else None,
            }
        return out
    return {}
