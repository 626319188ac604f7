"""Cache-barrier lifecycle for library operators.

Several operators persist small intermediate relations as *barriers* —
either because two consumers would otherwise re-execute a heavy
upstream (candidate shingle sets, SemDeDup cell assignments) or because
a bare ``filter(score >= t)`` above a pair join gets pushed INTO the
join condition, evaluating the heavy score expression twice per pair
and degrading the stage out of whole-stage codegen. Those barriers are
correct and measured-faster, but a ``persist()`` without an owner
leaks: a long-running session that calls the operators repeatedly (the
scheduled-pipeline shape, reference scd2-job-scheduler.yaml:8-14)
accumulates MEMORY_AND_DISK blocks until LRU pressure.

This module gives every barrier an owner without changing operator
semantics:

- Operators call :func:`pin` instead of ``DataFrame.persist``. The
  relation is persisted exactly as before AND registered with the
  innermost active :class:`CacheScope`, if any.
- The engine's ``PipelineContext`` owns a scope for the whole run:
  stage bodies execute under it, so operator barriers created by any
  stage are released by ``PipelineContext.close()`` alongside the Arc
  ``persist: true`` views it already tracked.
- Bare-library callers own the lifecycle explicitly::

      with cache_scope():
          out = minhash_lsh_pairs(docs).collect()   # barriers live here
      # all operator caches released

  The scope releases on exit — AFTER the caller's action, which is the
  contract: the barrier must hold *during* the query (operators build
  lazy plans; materialization happens at the caller's action).
- Without any active scope, :func:`pin` behaves exactly like a bare
  ``persist()`` (the caller keeps today's semantics — e.g. the driver's
  correctness runner, which collects once and exits the process).

Thread-aware by construction: the context variable propagates per
thread, and the engine's DAG runner activates the pipeline's scope
inside each worker thread (``use_scope``), so barriers created by
parallel stages all land with the run's owner. ``CacheScope`` mutation
is GIL-atomic list append/pop.
"""

from __future__ import annotations

import contextlib
import contextvars
from collections.abc import Iterator

from pyspark.sql import DataFrame

_ACTIVE: contextvars.ContextVar["CacheScope | None"] = contextvars.ContextVar(
    "sql_based_etl_cache_scope", default=None)


class CacheScope:
    """Owner of operator-level persist barriers: collects every
    :func:`pin` issued while active and releases them on
    :meth:`release` (idempotent; tolerates an already-stopped
    session)."""

    def __init__(self) -> None:
        self._pinned: list[DataFrame] = []

    def add(self, df: DataFrame) -> DataFrame:
        self._pinned.append(df)
        return df

    @property
    def pinned_count(self) -> int:
        return len(self._pinned)

    def release(self) -> None:
        while self._pinned:
            df = self._pinned.pop()
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — session already stopped
                pass


@contextlib.contextmanager
def cache_scope() -> Iterator[CacheScope]:
    """Create, activate, and on exit RELEASE a new scope — the
    bare-library owner: wrap the operator call *and its action*."""
    scope = CacheScope()
    token = _ACTIVE.set(scope)
    try:
        yield scope
    finally:
        _ACTIVE.reset(token)
        scope.release()


@contextlib.contextmanager
def use_scope(scope: CacheScope) -> Iterator[CacheScope]:
    """Activate an EXISTING scope without owning its release — how the
    engine runs stage bodies under the PipelineContext's scope (and how
    DAG worker threads join it, since context variables don't propagate
    into ThreadPoolExecutor threads)."""
    token = _ACTIVE.set(scope)
    try:
        yield scope
    finally:
        _ACTIVE.reset(token)


def active_scope() -> CacheScope | None:
    return _ACTIVE.get()


def pin(df: DataFrame) -> DataFrame:
    """``persist()`` with an owner: registers the relation with the
    innermost active :class:`CacheScope` so it is unpersisted when the
    scope closes. No active scope = today's bare persist (caller-owned,
    process-lifetime)."""
    df = df.persist()
    scope = _ACTIVE.get()
    if scope is not None:
        scope.add(df)
    return df
