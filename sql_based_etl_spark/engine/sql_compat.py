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
    then a disjunction and no conjunct is individually implied.

    BETWEEN-aware: the ``AND`` that closes a same-depth ``BETWEEN``
    is part of that predicate, not a conjunction boundary — splitting
    there would orphan the upper bound as a pseudo-conjunct (``x
    BETWEEN 1 AND b = 3`` must never yield an implied ``b = 3``)."""
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    n = len(cond)
    up = cond.upper()
    pending_between = 0  # BETWEENs at depth 0 awaiting their AND

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
        elif depth == 0 and up.startswith("BETWEEN", i) and _bound(i, 7):
            pending_between += 1
            i += 7
            continue
        elif depth == 0 and up.startswith("AND", i) and _bound(i, 3):
            if pending_between:
                pending_between -= 1
                i += 3
                continue
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
_TRIPLE_BETWEEN = re.compile(
    rf"^(?:(\w+)\s*\.\s*)?(\w+)\s+BETWEEN\s+({_TRIPLE_LIT})"
    rf"\s+AND\s+({_TRIPLE_LIT})$",
    re.IGNORECASE | re.DOTALL)
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


def _make_col_resolver(t_cols: list[str], alias: str | None):
    """The shared column-reference rule for predicate extraction:
    with ``alias`` set, only refs qualified by exactly that alias
    resolve; with ``alias`` None, only BARE refs do (a qualified ref is
    struct-field access or an unresolvable table alias — attributing
    either to a top-level column would mis-scope the predicate)."""
    low2col = {c.lower(): c for c in t_cols}

    def _col(qual: str | None, name: str) -> str | None:
        if alias is not None and (qual or "").lower() != alias.lower():
            return None
        if alias is None and qual is not None:
            return None
        return low2col.get(name.lower())

    return _col


def _extract_triple(s: str, _col) -> tuple | None:
    """One comparison ATOM as ``(col, op, literal)`` — the four shapes
    condition_implied_triples documents — or None. ``_col`` is a
    resolver from :func:`_make_col_resolver`."""
    m = _TRIPLE_CMP.match(s)
    if m:
        c = _col(m.group(1), m.group(2))
        return (c, m.group(3), _triple_lit_value(m.group(4))) if c else None
    m = _TRIPLE_CMP_REV.match(s)
    if m:
        c = _col(m.group(3), m.group(4))
        return (c, _FLIP_OP[m.group(2)],
                _triple_lit_value(m.group(1))) if c else None
    m = _TRIPLE_NULL.match(s)
    if m:
        c = _col(m.group(1), m.group(2))
        return (c, "is not null" if m.group(3) else "is null",
                None) if c else None
    m = _TRIPLE_IN.match(s)
    if m:
        c = _col(m.group(1), m.group(2))
        if c is None:
            return None
        body = s[s.index("(", m.end(2)):]
        lits = [_triple_lit_value(x.group(0))
                for x in _TRIPLE_IN_LITS.finditer(body)]
        return (c, "in", lits)
    return None


def _extract_between(s: str, _col) -> list[tuple] | None:
    """``[alias.]col BETWEEN lo AND hi`` as its two implied triples
    ``[(col, ">=", lo), (col, "<=", hi)]``, or None. Positive BETWEEN
    only — ``NOT BETWEEN`` stays widened by the callers."""
    m = _TRIPLE_BETWEEN.match(s)
    if not m:
        return None
    c = _col(m.group(1), m.group(2))
    if c is None:
        return None
    return [(c, ">=", _triple_lit_value(m.group(3))),
            (c, "<=", _triple_lit_value(m.group(4)))]


def _shed_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        inner = s[1:-1]
        if split_top_and(inner) is None and _split_top_or(inner) is None:
            break
        s = inner.strip()
    return s


def _split_top_or(cond: str) -> list[str] | None:
    """Top-level ``OR`` operands (string literals and parens opaque);
    None when malformed or when a top-level AND makes the expression a
    conjunction instead.

    BETWEEN-aware like :func:`split_top_and`: the ``AND`` that closes
    a same-depth ``BETWEEN`` is part of that predicate — it must
    neither abort the OR split nor end an operand, so
    ``p = 'A' OR x BETWEEN 1 AND 2`` splits into its two operands."""
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    n = len(cond)
    up = cond.upper()
    pending_between = 0  # BETWEENs at depth 0 awaiting their AND

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
                return None
        elif depth == 0 and up.startswith("BETWEEN", i) and _bound(i, 7):
            pending_between += 1
            i += 7
            continue
        elif depth == 0 and up.startswith("AND", i) and _bound(i, 3):
            if pending_between:
                pending_between -= 1
                i += 3
                continue
            return None
        elif depth == 0 and up.startswith("OR", i) and _bound(i, 2):
            parts.append(cond[start:i])
            start = i + 2
            i += 2
            continue
        i += 1
    parts.append(cond[start:])
    return parts


# --- scope-tree evaluation (shared by the Delta bridge and the native
# VersionedTable): per-row predicate values live in Kleene's {T, U, F};
# a FILE is summarized by the SET of values its rows can take, so the
# cross-product combination of child sets is a sound overapproximation
# of pairing each row's own values, and "no row can be T" — the only
# conclusion the OCC/pruning consumers draw — is exactly `"T" not in
# set`. --------------------------------------------------------------

KLEENE_ANY = frozenset("TUF")
_KLEENE_NOT = {"T": "F", "F": "T", "U": "U"}

# Delta's default string-stats prefix length. A conforming writer
# truncates a long max value to this many chars AND increments the
# last char (making it a strict upper bound); a sloppy writer that
# truncates WITHOUT the increment stores a raw prefix — protocol-
# violating, but the plausible failure mode. Defense-in-depth: any
# string `hi` of at least this length is treated as a possible raw
# prefix, so the sound premise weakens from "true max <= hi" to
# "true max < prefix_successor(hi)". Shorter strings cannot be
# 32-char truncation outputs and stay exact; a writer truncating at
# some OTHER length remains out of contract (undetectable).
STRING_STATS_PREFIX_LEN = 32


def string_upper_bound(hi):
    """``(bound, inclusive)`` for a stats ``maxValues`` entry under the
    defense-in-depth contract above. Non-strings and short strings are
    exact: ``(hi, True)``. A possibly-truncated string returns its
    prefix-successor as an EXCLUSIVE bound — every string with that
    prefix is < the successor. All-U+10FFFF prefixes have no successor:
    ``(None, False)`` = no provable upper bound."""
    if not isinstance(hi, str) or len(hi) < STRING_STATS_PREFIX_LEN:
        return hi, True
    for i in range(len(hi) - 1, -1, -1):
        cp = ord(hi[i])
        if cp < 0x10FFFF:
            return hi[:i] + chr(cp + 1), False
    return None, False


def _kleene_and(a: str, b: str) -> str:
    if a == "F" or b == "F":
        return "F"
    return "U" if "U" in (a, b) else "T"


def _kleene_or(a: str, b: str) -> str:
    if a == "T" or b == "T":
        return "T"
    return "U" if "U" in (a, b) else "F"


def stats_value_set(op: str, lit, lo, hi, nulls, num) -> frozenset:
    """Possible per-row Kleene values of ``col op lit`` over a file
    whose column envelope is [lo, hi] with ``nulls`` null rows out of
    ``num`` (any of them None = unknown). Bounds contract: ``lo`` is a
    LOWER bound on the file's true min (a truncated min is a prefix,
    and a prefix is always <= the value — safe even from a sloppy
    writer) and ``hi`` an UPPER bound on its true max, HEDGED for
    strings via :func:`string_upper_bound` so a raw-prefix
    ``maxValues`` from a protocol-violating writer still cannot make
    an all-satisfy / none-satisfy proof misfire."""
    if op in ("is null", "is not null"):
        t_when_null = op == "is null"
        if nulls is None or num is None:
            return frozenset("TF")
        if nulls == num:
            return frozenset("T" if t_when_null else "F")
        if nulls == 0:
            return frozenset("F" if t_when_null else "T")
        return frozenset("TF")
    no_nonnull = nulls is not None and num is not None and nulls == num
    hi, hi_inc = string_upper_bound(hi)
    if no_nonnull:
        nonnull: frozenset = frozenset()
    elif lo is None or hi is None:
        nonnull = frozenset("TF")
    else:
        # with hi_inc False the envelope is [lo, hi): x <= hi proofs
        # become x < hi, and equality-pin proofs (lo == hi) are gone
        try:
            if op == "in":
                all_sat = hi_inc and lo == hi and any(lo == x for x in lit)
                none_sat = all(
                    x < lo or (x > hi if hi_inc else x >= hi) for x in lit)
            elif op == "=":
                all_sat = hi_inc and lo == hi == lit
                none_sat = lit < lo or (lit > hi if hi_inc else lit >= hi)
            elif op == "<":
                all_sat = hi < lit if hi_inc else hi <= lit
                none_sat = lo >= lit
            elif op == "<=":
                all_sat, none_sat = hi <= lit, lo > lit
            elif op == ">":
                all_sat, none_sat = lo > lit, hi <= lit
            elif op == ">=":
                all_sat = lo >= lit
                none_sat = hi < lit if hi_inc else hi <= lit
            else:
                return KLEENE_ANY
            nonnull = (frozenset("T") if all_sat
                       else frozenset("F") if none_sat
                       else frozenset("TF"))
        except TypeError:
            nonnull = frozenset("TF")
    out = set(nonnull)
    if nulls is None or (isinstance(nulls, int) and nulls > 0):
        out.add("U")  # null rows (possibly) exist → comparisons UNKNOWN
    return frozenset(out) or frozenset("U")


def eval_scope_tree(tree, atom_fn) -> bool:
    """True unless the tree PROVES no row of the file can satisfy the
    predicate. ``atom_fn(col, op, lit) -> frozenset`` supplies each
    atom's possible per-row value set (partition lane, stats lane —
    the caller's business)."""
    def _ev(node) -> frozenset:
        kind = node[0]
        if kind == "const":
            return frozenset("T") if node[1] else frozenset("F")
        if kind == "atom":
            return atom_fn(*node[1])
        if kind == "not":
            return frozenset(_KLEENE_NOT[a] for a in _ev(node[1]))
        parts = [_ev(ch) for ch in node[1]]
        comb = _kleene_and if kind == "and" else _kleene_or
        acc = parts[0]
        for p in parts[1:]:
            acc = frozenset(comb(a, b) for a in acc for b in p)
        return acc

    return "T" in _ev(tree)


def condition_scope_tree(cond: str, scope_cols: list[str],
                         alias: str | None):
    """Reduce a SQL condition to the boolean expression it implies over
    the SCOPABLE columns (those a file-level evaluator can decide from
    partition values or min/max/null stats) — the fallback read
    footprint for predicate shapes :func:`condition_implied_triples`
    cannot take (top-level ORs, NOTs over conjuncts), so a MERGE whose
    ON is ``(t.p = 'A' AND …) OR (t.p = 'A' AND …)`` still commutes
    with a concurrent append to partition B — and, via the stats lane
    of the evaluators, an unpartitioned ``(t.k < 5 AND …) OR (t.k < 9
    AND …)`` commutes with an append whose files hold only k ≥ 9.

    Soundness: every atom that is not a scope-column comparison of a
    triple shape is replaced by TRUE at positive polarity and FALSE
    under an odd number of NOTs. AND/OR/NOT are monotone in Kleene's
    truth order under that substitution, so the reduced predicate P' is
    row-wise ≥ the original P — P' evaluating FALSE over a file's
    partition assignment / stats envelope proves NO row of the file
    can satisfy P. Widening only: an unparseable shape reduces toward
    TRUE (no information), never toward FALSE.

    Returns a tree of ``("const", bool)`` / ``("atom", (col, op, lit))``
    / ``("and"|"or", [children])`` / ``("not", child)`` nodes, or None
    when the reduction is vacuous (no scope-column information).
    """
    if not scope_cols:
        return None
    _col = _make_col_resolver(scope_cols, alias)

    def _dedup(flat):
        seen: set[str] = set()
        out = []
        for ch in flat:
            key = repr(ch)
            if key not in seen:
                seen.add(key)
                out.append(ch)
        return out

    def _and(children):
        flat = []
        for ch in children:
            if ch == ("const", False):
                return ("const", False)
            if ch == ("const", True):
                continue
            flat.extend(ch[1] if ch[0] == "and" else [ch])
        flat = _dedup(flat)
        if not flat:
            return ("const", True)
        return flat[0] if len(flat) == 1 else ("and", flat)

    def _or(children):
        flat = []
        for ch in children:
            if ch == ("const", True):
                return ("const", True)
            if ch == ("const", False):
                continue
            flat.extend(ch[1] if ch[0] == "or" else [ch])
        flat = _dedup(flat)
        if not flat:
            return ("const", False)
        return flat[0] if len(flat) == 1 else ("or", flat)

    def _reduce(expr: str, polarity: bool):
        s = _shed_parens(expr)
        ands = split_top_and(s)
        if ands is not None and len(ands) > 1:
            return _and([_reduce(a, polarity) for a in ands])
        ors = _split_top_or(s)
        if ors is not None and len(ors) > 1:
            return _or([_reduce(o, polarity) for o in ors])
        if ands is None and ors is None:
            return ("const", polarity)  # malformed parens — no info
        up = s.upper()
        if up.startswith("NOT") and (len(s) == 3 or not (
                s[3].isalnum() or s[3] in "_.")):
            child = _reduce(s[3:], not polarity)
            if child[0] == "const":
                return ("const", not child[1])
            return ("not", child)
        t = _extract_triple(s, _col)
        if t is not None:
            return ("atom", t)
        bt = _extract_between(s, _col)
        if bt is not None:
            # exact expansion (NULL-identical to SQL BETWEEN), so it
            # is polarity-safe: NOT over the AND stays exact Kleene
            return _and([("atom", a) for a in bt])
        return ("const", polarity)

    tree = _reduce(cond, True)
    return None if tree == ("const", True) else tree


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
    # shared resolver: with alias, only `alias.col` resolves; without,
    # only BARE refs — a qualified ref there is struct-field access
    # (`s.flag`, which must never be attributed to a top-level `flag`:
    # silently wrong DELETEs) or an unresolvable table alias
    _col = _make_col_resolver(t_cols, alias)
    out: list[tuple] = []
    for raw in conjuncts:
        s = raw.strip()
        while (s.startswith("(") and s.endswith(")")
               and split_top_and(s[1:-1]) is not None):
            s = s[1:-1].strip()  # shed redundant wrapping parens
        t = _extract_triple(s, _col)
        if t is not None:
            out.append(t)
            continue
        bt = _extract_between(s, _col)
        if bt is not None:
            out.extend(bt)
    return out
