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
    resolved by the COLUMN name alone — UNLESS the qualifier itself
    names a known column, in which case ``a.b`` is STRUCT-FIELD access
    (rewriting it by the dtype of an unrelated top-level ``b`` would
    corrupt a valid boolean comparison) and the literal stays. Boolean
    columns and unknown names keep their literal."""
    low = {k.lower(): v for k, v in dtypes.items()}

    def _qualifies(qual: str | None) -> bool:
        # None = bare ref; a qualifier that IS a column is struct access
        return qual is None or qual.lower() not in low

    def repl_rhs(m: re.Match) -> str:
        qual, col, op, word = (m.group(1), m.group(2), m.group(3),
                               m.group(4))
        dt = low.get(col.lower())
        if _qualifies(qual) and dt is not None and dt != "boolean":
            name = f"{qual}.{col}" if qual else col
            return f"{name} {op} {_lit(word)}"
        return m.group(0)

    def repl_lhs(m: re.Match) -> str:
        word, op, qual, col = (m.group(1), m.group(2), m.group(3),
                               m.group(4))
        dt = low.get(col.lower())
        if _qualifies(qual) and dt is not None and dt != "boolean":
            name = f"{qual}.{col}" if qual else col
            return f"{_lit(word)} {op} {name}"
        return m.group(0)

    return _sub_outside_quotes(
        pred, lambda seg: _BARE_LHS.sub(repl_lhs, _BARE_RHS.sub(repl_rhs, seg))
    )


def split_top_and(cond: str) -> list[str] | None:
    """Split a SQL boolean expression into its TOP-LEVEL ``AND``
    conjuncts (string literals and parenthesized groups opaque).
    Returns None when a top-level ``OR`` exists — the expression is
    then a disjunction and no conjunct is individually implied."""
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    n = len(cond)
    up = cond.upper()

    def _bound(j: int, ln: int) -> bool:
        before = cond[j - 1] if j > 0 else " "
        after = cond[j + ln] if j + ln < n else " "
        return (not (before.isalnum() or before in "_.")
                and not (after.isalnum() or after in "_."))

    while i < n:
        c = cond[i]
        if c == "'":
            j = i + 1
            while j < n:
                if cond[j] == "'":
                    if j + 1 < n and cond[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return None  # malformed — refuse to extract anything
        elif depth == 0 and up.startswith("AND", i) and _bound(i, 3):
            parts.append(cond[start:i])
            start = i + 3
            i += 3
            continue
        elif depth == 0 and up.startswith("OR", i) and _bound(i, 2):
            return None
        i += 1
    parts.append(cond[start:])
    return parts


_TRIPLE_LIT = (r"(?:DATE\s*)?'(?:[^']|'')*'"
               r"|-?\d+(?:\.\d+)?"
               r"|true|false")
_TRIPLE_CMP = re.compile(
    rf"^(?:(\w+)\s*\.\s*)?(\w+)\s*(=|<=|>=|<|>)\s*({_TRIPLE_LIT})$",
    re.IGNORECASE | re.DOTALL)
_TRIPLE_CMP_REV = re.compile(
    rf"^({_TRIPLE_LIT})\s*(=|<=|>=|<|>)\s*(?:(\w+)\s*\.\s*)?(\w+)$",
    re.IGNORECASE | re.DOTALL)
_TRIPLE_NULL = re.compile(
    r"^(?:(\w+)\s*\.\s*)?(\w+)\s+IS\s+(NOT\s+)?NULL$", re.IGNORECASE)
_TRIPLE_IN = re.compile(
    rf"^(?:(\w+)\s*\.\s*)?(\w+)\s+IN\s*\(\s*({_TRIPLE_LIT})"
    rf"(?:\s*,\s*(?:{_TRIPLE_LIT}))*\s*\)$",
    re.IGNORECASE | re.DOTALL)
_TRIPLE_IN_LITS = re.compile(_TRIPLE_LIT, re.IGNORECASE)
_FLIP_OP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}


def _triple_lit_value(tok: str):
    t = tok.strip()
    low = t.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if t[:1] == "'" or low.startswith("date"):
        body = t[t.index("'") + 1:-1]
        return body.replace("''", "'")
    return float(t) if "." in t else int(t)


def condition_implied_triples(cond: str, t_cols: list[str],
                              alias: str | None) -> list[tuple]:
    """Extract the single-table ``(column, op, literal)`` conjuncts a
    SQL condition PROVABLY implies — the loser's read footprint for
    predicate-scoped optimistic concurrency (and for driver-side file
    pruning). Conservative by construction: only TOP-LEVEL ``AND``
    conjuncts of the shape ``[alias.]col op literal`` / ``IS [NOT]
    NULL`` / ``IN (literals)`` are taken; anything else (ORs,
    functions, column-to-column comparisons, sub-selects) is skipped —
    skipping only WIDENS the declared footprint, never narrows it.

    ``alias``: required qualifier for merge ON conditions (the target
    relation's alias — an unqualified or source-qualified ref is
    skipped); None for single-table predicates, where only BARE column
    refs are taken — a qualified ref there is either struct-field
    access (``s.flag``, which must never be attributed to a top-level
    ``flag``) or an unresolvable table alias, and both are skipped.
    Column names resolve case-insensitively to the LOGICAL schema
    names (what the stats pruners expect)."""
    conjuncts = split_top_and(cond)
    if conjuncts is None:
        return []
    low2col = {c.lower(): c for c in t_cols}

    def _col(qual: str | None, name: str) -> str | None:
        if alias is not None and (qual or "").lower() != alias.lower():
            return None  # must name the target relation explicitly
        if alias is None and qual is not None:
            # single-table predicates: a qualified ref is either
            # STRUCT-FIELD access (`s.flag` — attributing it to an
            # unrelated top-level `flag` would prune files that DO
            # contain matching rows: silently wrong DELETEs) or a
            # table alias that cannot resolve anyway — skip both
            return None
        return low2col.get(name.lower())

    out: list[tuple] = []
    for raw in conjuncts:
        s = raw.strip()
        while (s.startswith("(") and s.endswith(")")
               and split_top_and(s[1:-1]) is not None):
            s = s[1:-1].strip()  # shed redundant wrapping parens
        m = _TRIPLE_CMP.match(s)
        if m:
            c = _col(m.group(1), m.group(2))
            if c is not None:
                out.append((c, m.group(3), _triple_lit_value(m.group(4))))
            continue
        m = _TRIPLE_CMP_REV.match(s)
        if m:
            c = _col(m.group(3), m.group(4))
            if c is not None:
                out.append((c, _FLIP_OP[m.group(2)],
                            _triple_lit_value(m.group(1))))
            continue
        m = _TRIPLE_NULL.match(s)
        if m:
            c = _col(m.group(1), m.group(2))
            if c is not None:
                out.append((c, "is not null" if m.group(3) else "is null",
                            None))
            continue
        m = _TRIPLE_IN.match(s)
        if m:
            c = _col(m.group(1), m.group(2))
            if c is not None:
                body = s[s.index("(", m.end(2)):]
                lits = [_triple_lit_value(x.group(0))
                        for x in _TRIPLE_IN_LITS.finditer(body)]
                out.append((c, "in", lits))
            continue
    return out
