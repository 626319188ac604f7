"""Arc/Spark-3 SQL compatibility shims.

The reference pipeline was written for Arc on Spark 3.0, whose
``BooleanEquality`` type-coercion rule allowed ``int_col = true``
(scd2-job.ipynb:313 ``old.iscurrent=true``, :346 merge condition).
Spark 4 removed that rule — the comparison is now a hard
DATATYPE_MISMATCH — so running the reference's SQL unchanged needs the
coercion reproduced at the engine boundary.
"""

from __future__ import annotations

import re

_RHS = re.compile(r"(=|<>|!=)(\s*)(true|false)\b", re.IGNORECASE)
_LHS = re.compile(r"\b(true|false)(\s*)(=|<>|!=)", re.IGNORECASE)
_QUALIFIED = re.compile(
    r"\b(\w+)\.(\w+)\s*(=|<>|!=)\s*(true|false)\b", re.IGNORECASE
)

# regions the rewrites must never touch: '…' string literals (with ''
# escapes), "…" quoted identifiers, `…` backtick identifiers, -- line
# comments, /* */ block comments
_PROTECTED = re.compile(
    r"('(?:[^']|'')*')"
    r'|("(?:[^"]|"")*")'
    r"|(`[^`]*`)"
    r"|(--[^\n]*)"
    r"|(/\*.*?\*/)",
    re.DOTALL,
)


def _sub_outside_quotes(sql: str, fn) -> str:
    """Apply ``fn`` to the segments of ``sql`` outside string literals,
    quoted identifiers, and comments — a comparison text INSIDE a
    literal is data, and rewriting it would change values, not
    semantics."""
    out, pos = [], 0
    for m in _PROTECTED.finditer(sql):
        out.append(fn(sql[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(fn(sql[pos:]))
    return "".join(out)


def _lit(word: str) -> str:
    return "1" if word.lower() == "true" else "0"


def coerce_boolean_equality(sql: str) -> str:
    """Rewrite boolean literals in =/<> comparisons to 1/0 (Spark 3's
    BooleanEquality semantics), skipping string literals, quoted
    identifiers, and comments. Use ONLY as an error-driven retry: a
    query whose first analysis succeeded never sees this, so genuine
    boolean-column comparisons are untouched."""

    def rewrite(segment: str) -> str:
        segment = _RHS.sub(
            lambda m: m.group(1) + m.group(2) + _lit(m.group(3)), segment
        )
        return _LHS.sub(
            lambda m: _lit(m.group(1)) + m.group(2) + m.group(3), segment
        )

    return _sub_outside_quotes(sql, rewrite)


def coerce_condition_for_types(cond: str, dtypes_by_alias: dict[str, dict[str, str]]) -> str:
    """Dtype-aware rewrite for merge conditions: only a comparison
    ``alias.col = true|false`` whose column is known NON-boolean gets
    its literal rewritten to 1/0 — boolean columns keep their literal.
    ``dtypes_by_alias``: {"target": {col: dtype}, "source": {...}}."""

    def repl(m: re.Match) -> str:
        alias, col, op, word = m.group(1), m.group(2), m.group(3), m.group(4)
        dt = dtypes_by_alias.get(alias.lower(), {}).get(col)
        if dt is not None and dt != "boolean":
            return f"{alias}.{col} {op} {_lit(word)}"
        return m.group(0)

    return _sub_outside_quotes(cond, lambda seg: _QUALIFIED.sub(repl, seg))


_BARE_RHS = re.compile(
    r"(?<![.\w])(?:(\w+)\s*\.\s*)?(\w+)\s*(=|<>|!=|<=|>=)\s*(true|false)\b",
    re.IGNORECASE,
)
_BARE_LHS = re.compile(
    r"\b(true|false)\s*(=|<>|!=|<=|>=)\s*(?:(\w+)\s*\.\s*)?(\w+)(?![.\w(])",
    re.IGNORECASE,
)


def coerce_predicate_for_types(pred: str, dtypes: dict[str, str]) -> str:
    """Dtype-aware rewrite for single-table predicates (DELETE WHERE):
    a comparison ``col = true|false`` (either side, ``=``/``<>``/``!=``
    and the ordered ``<=``/``>=`` BooleanEquality also coerced) whose
    column is known NON-boolean gets its literal rewritten to 1/0 —
    the same rule :func:`coerce_condition_for_types` applies to
    alias-qualified merge conditions, so ``iscurrent = true`` behaves
    identically between MERGE delete clauses and DELETE. The predicate
    is single-table, so an alias qualifier (``t.iscurrent = true``) is
    resolved by the COLUMN name alone — any qualifier names the one
    table. Boolean columns and unknown names keep their literal."""
    low = {k.lower(): v for k, v in dtypes.items()}

    def repl_rhs(m: re.Match) -> str:
        qual, col, op, word = (m.group(1), m.group(2), m.group(3),
                               m.group(4))
        dt = low.get(col.lower())
        if dt is not None and dt != "boolean":
            name = f"{qual}.{col}" if qual else col
            return f"{name} {op} {_lit(word)}"
        return m.group(0)

    def repl_lhs(m: re.Match) -> str:
        word, op, qual, col = (m.group(1), m.group(2), m.group(3),
                               m.group(4))
        dt = low.get(col.lower())
        if dt is not None and dt != "boolean":
            name = f"{qual}.{col}" if qual else col
            return f"{_lit(word)} {op} {name}"
        return m.group(0)

    return _sub_outside_quotes(
        pred, lambda seg: _BARE_LHS.sub(repl_lhs, _BARE_RHS.sub(repl_rhs, seg))
    )
