"""Config layer: variable substitution + stage-config parsing.

Implements the reference's three parameterization mechanisms
(SURVEY.md §2e P1-P3), all resolved before Spark sees a plan:

- HOCON-style env splicing ``"prefix"${VAR}"suffix"`` and plain
  ``${VAR}`` inside strings (scd2-job.ipynb:42,167,211; CLI args
  ``--ETL_CONF_*`` at scd2-job-scheduler.yaml:31,46,62)
- pipeline variables set interactively via ``%env K=V``
  (scd2-job.ipynb:131-132,263-264)
- per-stage ``sqlParams`` ``${param}`` substitution into SQL text
  (scd2-job.ipynb:141,145,381-383)
"""

from __future__ import annotations

import json
import os
import re
import shlex
from typing import Any

_VAR = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


class ConfigError(ValueError):
    pass


def resolve_vars(text: str, variables: dict[str, str], strict: bool = True) -> str:
    """Replace ``${VAR}`` from ``variables`` (pipeline vars first, then
    process environment — matching Arc's env-var splicing)."""

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name in variables:
            return str(variables[name])
        if name in os.environ:
            return os.environ[name]
        if strict:
            raise ConfigError(f"unresolved variable ${{{name}}}")
        return m.group(0)

    return _VAR.sub(sub, text)


def _fold_hocon_splices(text: str) -> str:
    """Fold HOCON value concatenation into single JSON strings:
    ``"s3a://"${VAR}"/path"`` → ``"s3a://${VAR}/path"``
    (the reference's splice syntax, scd2-job.ipynb:42,167,211).

    A tiny lexer — regexes can't do this safely because an unquoted
    ``${VAR}`` is only a splice *outside* string literals, and JSON text
    is full of quote pairs a regex would mispair."""
    out: list[str] = []
    run: list[str] = []  # inner contents of an adjacent string/var run

    def flush() -> None:
        if run:
            out.append('"' + "".join(run) + '"')
            run.clear()

    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            j = i + 1
            buf: list[str] = []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    buf.append(text[j : j + 2])
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ConfigError("unterminated string in stage config")
            run.append("".join(buf))
            i = j + 1
            # run continues only on direct adjacency with `${` or `"`
            if i < n and (text[i] == '"' or text.startswith("${", i)):
                continue
            flush()
        elif text.startswith("${", i):
            j = text.find("}", i)
            if j < 0:
                raise ConfigError("unterminated ${...} in stage config")
            run.append(text[i : j + 1])
            i = j + 1
            if i < n and (text[i] == '"' or text.startswith("${", i)):
                continue
            flush()  # standalone unquoted var → quoted string value
        else:
            out.append(c)
            i += 1
    flush()
    return "".join(out)


_VALUE_END = set('"}]') | set("0123456789") | set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
_VALUE_START = set('"-${[') | set("0123456789") | set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def _strip_hocon_extras(text: str) -> str:
    """Normalize the HOCON conveniences the reference's stage cells use
    down to strict JSON: ``//`` and ``#`` comments (scd2-job.ipynb's
    ``//merge key is null``), newline-separated members with no comma,
    and trailing commas. String-aware — a ``//`` inside ``"s3a://…"``
    is content, not a comment."""
    out: list[str] = []
    last = -1  # index in out of the last significant char
    newline = False
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            j = i + 1
            while j < n and text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            if j >= n:
                raise ConfigError("unterminated string in stage config")
            if newline and last >= 0 and out[last] in _VALUE_END:
                out.append(",")
            out.extend(text[i : j + 1])
            last, newline, i = len(out) - 1, False, j + 1
        elif text.startswith("//", i) or c == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "\n":
            newline = True
            out.append(c)
            i += 1
        elif c in " \t\r":
            out.append(c)
            i += 1
        else:
            if c in "}]" and last >= 0 and out[last] == ",":
                out[last] = " "  # trailing comma
                while last >= 0 and out[last] in ' \t\r\n':
                    last -= 1
            elif newline and last >= 0 and out[last] in _VALUE_END and c in _VALUE_START:
                out.append(",")
            out.append(c)
            last, newline = len(out) - 1, False
            i += 1
    return "".join(out)


def parse_stage_config(text: str, variables: dict[str, str]) -> dict[str, Any]:
    """Parse one stage-config cell (JSON with HOCON-isms the reference
    uses: unquoted ``${VAR}`` splices adjacent to quoted strings,
    comments, optional commas)."""
    text = resolve_vars(_fold_hocon_splices(_strip_hocon_extras(text)), variables)
    try:
        return json.loads(text)
    except json.JSONDecodeError as e:
        raise ConfigError(f"stage config is not valid JSON after substitution: {e}") from e


def substitute_sql_params(sql: str, sql_params: dict[str, str] | None) -> str:
    """Per-stage ``${param}`` substitution into SQL text (P3)."""
    if not sql_params:
        return sql
    return resolve_vars(sql, {str(k): str(v) for k, v in sql_params.items()}, strict=False)


def parse_magic_line(line: str) -> tuple[str, dict[str, str], list[str]]:
    """Parse a ``%magic [arg] key=value …`` line (M1-M4 surface,
    scd2-job.ipynb:20,66,131,141). Values may be quoted; ``sqlParams``
    accepts comma-separated k=v pairs; bare tokens (e.g. the view name
    of ``%printschema``) are returned positionally."""
    tokens = shlex.split(line.strip())
    magic = tokens[0].lstrip("%")
    opts: dict[str, str] = {}
    args: list[str] = []
    for tok in tokens[1:]:
        if "=" in tok:
            k, v = tok.split("=", 1)
            opts[k] = v
        else:
            args.append(tok)
    return magic, opts, args
