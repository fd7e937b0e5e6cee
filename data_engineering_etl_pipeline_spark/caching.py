"""Engine-owned persist lifecycle (r5 VERDICT item 6).

Several operators persist an intermediate that a LAZY result plan cannot
unpersist behind itself — the tokenized-docs projection feeding both sides
of a near-dup self-join, the deduped prefix of ``prepare_training_corpus``,
the TF-IDF vectorizer with three consumers, the fetched fact of the live
refresh. Before r6 the release obligation was a docstring convention
("call ``spark.catalog.clearCache()`` when done"), which a long-lived
session composing several pipelines WILL eventually forget — accumulating
docs-sized pinned relations — and which is too blunt anyway (``clearCache``
also wipes caches the CALLER owns).

This module makes the engine's pins first-class:

- :func:`pin` — ``persist()`` + track. Every engine-internal persist goes
  through here.
- :func:`release_engine_pins` — unpersist exactly the engine's tracked
  pins (asynchronously; blocks nothing) and nothing else. Callers'
  own ``persist()`` calls are untouched. Idempotent; returns the count.
- :func:`engine_pin_scope` — context manager releasing the pins taken
  inside the scope, for callers that fully materialize within it::

      with engine_pin_scope():
          prepare_training_corpus(...).write.parquet(out)

Releasing a pin before the caller has executed the plan is always SAFE
(Spark recomputes) — only the shared-scan speedup is lost — so
``release_engine_pins`` needs no knowledge of what has or hasn't run.
bench.py calls it between queries (plus ``clearCache`` for its own
cold-data protocol).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: STRONG references, deliberately: the JVM-side cache outlives the Python
#: DataFrame wrapper (a query function's local `pin(...)` is unreachable the
#: moment the lazy result returns, while its executor blocks persist) — a
#: weakref here would silently forget exactly the pins this module exists
#: to release. The list is bounded by the engine work between release
#: calls and is cleared on every release.
_PINNED: list[DataFrame] = []


def pin(df: DataFrame,
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` at ``level`` and register it as an ENGINE pin that
    :func:`release_engine_pins` will drop. MEMORY_AND_DISK default: at
    100 TB an engine intermediate must spill like a shuffle write, not
    evict and recompute."""
    out = df.persist(level)
    _PINNED.append(out)
    return out


def release_engine_pins() -> int:
    """Unpersist every live engine pin (non-blocking) and forget them all.
    Caller-owned persists are untouched. Returns how many were released."""
    n = 0
    for df in _PINNED:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _PINNED.clear()
    return n


@contextmanager
def engine_pin_scope():
    """Release, on exit, exactly the engine pins taken INSIDE the scope —
    for callers that fully materialize their result within it. Pins taken
    before the scope are preserved."""
    mark = len(_PINNED)
    try:
        yield
    finally:
        tail = _PINNED[mark:]
        del _PINNED[mark:]
        for df in tail:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
