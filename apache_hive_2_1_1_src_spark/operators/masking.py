"""Row-level filtering and column masking — Hive's TableMask rewrite.

Reference: ql/src/java/org/apache/hadoop/hive/ql/parse/TableMask.java:42
(SemanticAnalyzer asks the authorizer for per-table policies via
``applyRowFilterAndColumnMasking`` — HiveAuthorizer.java — then
``TableMask.create`` builds the replacement text

    (SELECT CAST(maskExpr AS colType) AS colName, ...
     FROM tab WHERE rowFilterExpr) tab

and the UnparseTranslator substitutes it for every table reference in
the query).  The policy source in the clientpositive masking_*.q tests
is the hardcoded test authorizer
itests/util/.../sqlstd/SQLStdHiveAuthorizationValidatorForTest.java
(rowFilter ``key % 2 = 0 and key < 10`` + mask ``reverse(value)`` on
table ``masking_test``; an IN-correlated-subquery row filter on
``masking_test_subq``).

Spark-first shape: the SAME single-pass textual rewrite, applied in
HiveEngine.sql before handing the text to Catalyst.  The derived
subquery is plain ANSI SQL, so Catalyst folds the mask projection into
the scan and pushes residual predicates beneath it exactly as Hive's
CBO does after its own rewrite — and the identical expanded text runs
on DuckDB, which is what the oracle compares against.  No per-row
Python anywhere: masks are Catalyst expressions evaluated inside
whole-stage codegen.

Scale note: the rewrite is O(query text) on the driver; the executed
plan adds only a projection + filter above each masked scan, both
codegen-fused — zero extra shuffles at any scale.  The row filter
lands BEFORE any join/agg on the masked table, so masking never
widens a shuffle; a filter-heavy policy actually shrinks it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class MaskingPolicy:
    """One table's policy: HivePrivilegeObject.rowFilterExpression +
    cellValueTransformers (HiveAuthorizer.java applyRowFilterAndColumnMasking
    contract: a transformer per column; identity when absent here)."""

    row_filter: str | None = None
    column_masks: dict[str, str] = field(default_factory=dict)  # col -> expr


def masked_subquery(
    table: str,
    alias: str,
    columns: list[tuple[str, str]],
    policy: MaskingPolicy,
) -> str:
    """TableMask.create equivalent: the replacement text for one table
    reference.  ``columns`` is [(name, sql_type)] from the catalog
    schema; masks are CAST back to the declared column type
    (TableMask.java:117 ``CAST(expr AS colType) AS colName``).  The
    WHERE evaluates against the ORIGINAL columns (SQL semantics: the
    filter runs before the select list), matching Hive, and the inner
    table keeps its own name as qualifier so correlated row-filter
    subqueries referencing ``table.col`` still resolve
    (masking_test_subq's ``src.key = masking_test_subq.key``)."""
    sel = []
    for name, typ in columns:
        expr = policy.column_masks.get(name.lower())
        if expr is not None and expr.strip().lower() != name.lower():
            sel.append(f"CAST({expr} AS {typ}) AS {name}")
        else:
            sel.append(name)
    where = f" WHERE {policy.row_filter}" if policy.row_filter else ""
    return f"(SELECT {', '.join(sel)} FROM {table}{where}) {alias}"


def reference_test_policies() -> dict[str, MaskingPolicy]:
    """The hardcoded policies of the clientpositive test authorizer
    (SQLStdHiveAuthorizerFactoryForTest / ...ValidatorForTest), which
    every masking_*.q run enables via
    ``set hive.security.authorization.manager=...ForTest``."""
    return {
        "masking_test": MaskingPolicy(
            row_filter="key % 2 = 0 and key < 10",
            column_masks={"value": "reverse(value)"},
        ),
        "masking_test_subq": MaskingPolicy(
            row_filter=(
                "key in (select key from src "
                "where src.key = masking_test_subq.key)"
            ),
        ),
    }


_QUOTED = re.compile(r"'[^']*'|\"[^\"]*\"|`[^`]*`")
# Words after a table ref that are NOT an alias (clause keywords)
_NOT_ALIAS = {
    "where", "group", "order", "sort", "cluster", "distribute", "having",
    "limit", "union", "intersect", "except", "join", "inner", "left",
    "right", "full", "cross", "semi", "anti", "natural", "on", "using",
    "lateral", "tablesample", "qualify", "window", "select", "from",
    "insert", "values", "set", "when", "then", "else", "end", "and", "or",
    "as",
}


def rewrite_with_policies(
    text: str,
    policies: dict[str, MaskingPolicy],
    schema_fn,
) -> str:
    """Apply TableMask to a full query text: replace every read
    reference of a policied table (after FROM / JOIN / a from-list
    comma) with its masked derived subquery.  Single pass over the
    original text — the replacement's own inner ``FROM tab`` is never
    rescanned, mirroring the one-shot UnparseTranslator substitution.

    ``schema_fn(table) -> list[(col, sql_type)] | None`` supplies the
    catalog schema (None = table not yet created → leave the text
    alone, Hive would fail later at analysis just as Spark will).
    Write references (INSERT INTO/OVERWRITE TABLE t) never match — the
    rewrite keys on FROM/JOIN contexts only, and Hive likewise masks
    only read descendants (SemanticAnalyzer walks the read entities).
    """
    if not policies:
        return text
    # masking_4.q contract: a CTE whose name equals a policied table
    # SHADOWS the policy for this statement — references resolve to the
    # CTE, not the table, so they must not be rewritten (Hive resolves
    # the name to the CTE first and never asks the authorizer about it).
    shadowed = {
        m.group(1).lower()
        for m in re.finditer(r"(?:\bWITH|,)\s*(\w+)\s+AS\s*\(", text, re.IGNORECASE)
    }
    policies = {t: p for t, p in policies.items() if t not in shadowed}
    if not policies:
        return text
    names = "|".join(re.escape(t) for t in policies)
    # FROM tab / JOIN tab / ", tab" (from-list comma) — optionally
    # db-qualified (default.tab), optionally aliased ([AS] a)
    # (?!\s*\.) — a qualified COLUMN reference after a select-list or
    # function-arg comma ("SELECT key, masking_test.value FROM ...")
    # must not be mistaken for a from-list table reference
    pat = re.compile(
        rf"\b(FROM|JOIN|,)\s+(?:(\w+)\.)?({names})\b(?!\s*\.)"
        rf"(?:\s+(TABLESAMPLE\s*\([^)]*\)))?"
        rf"(?:\s+(?:AS\s+)?(\w+))?",
        re.IGNORECASE,
    )
    spans = [(m.start(), m.end()) for m in _QUOTED.finditer(text)]

    def _sub(m: re.Match) -> str:
        if any(s <= m.start() < e for s, e in spans):
            return m.group(0)
        kw, db, tab, sample, alias = m.groups()
        trailing_kw = ""
        if alias and alias.lower() in _NOT_ALIAS:
            # alias slot grabbed a clause keyword (FROM t WHERE ...),
            # not an alias — re-emit it after the substitution
            trailing_kw = f" {alias}"
            alias = None
        # a db-qualified reference is still the SAME policied table name:
        # the reference authorizer keys policies by table name regardless
        # of database (SQLStdHiveAuthorizationValidatorForTest.java
        # filters by name) — masking_1_newdb.q's newdb.masking_test must
        # be rewritten too, else the row filter is silently bypassed
        qualified = f"{db}.{tab}" if db else tab
        cols = schema_fn(qualified.lower() if db else tab.lower())
        if cols is None and db and db.lower() == "default":
            # default-qualification IS the bare table (the catalog may
            # only answer unqualified names)
            cols = schema_fn(tab.lower())
        if cols is None:
            return m.group(0)
        pol = policies[tab.lower()]
        body = masked_subquery(qualified, alias or tab, cols, pol)
        if sample:
            # Hive: `tab TABLESAMPLE (...) alias`; on a derived table
            # Spark wants the sample BEFORE the alias — same semantics
            # (sample applies above the mask, as in Hive's rewrite)
            inner, _, al = body.rpartition(") ")
            body = f"{inner}) {sample} {al}"
        return f"{kw} {body}{trailing_kw}"

    return pat.sub(_sub, text)
