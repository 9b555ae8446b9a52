"""Persist hygiene for operator intermediates.

Several operators persist() a mid-plan DataFrame so a self-join doesn't
recompute an expensive UDF/projection per join side (LSH bands, shingle
sets, normalized vectors). The persist is load-bearing — but a
long-running job composing many operators must not accumulate pinned
executor storage, and the operators themselves cannot unpersist eagerly:
they return LAZY DataFrames, and dropping the cache before the caller's
action would silently undo the reuse.

The contract here:

- operators call `scoped_persist(df)` instead of `df.persist()`;
- a caller that composes operators wraps the work in `cache_scope()`;
  every intermediate persisted underneath is unpersisted on exit:

      with cache_scope():
          out = ngram_jaccard(minhash_lsh_candidates(docs), docs)
          out.write.parquet(...)        # action happens INSIDE the scope
      # all operator caches released here

- the persisted handles are also attached to the scope list itself, so a
  caller that wants finer control can release individual entries;
- with no active scope the behavior is today's (persist and rely on
  `spark.catalog.clearCache()` / session teardown) — library functions
  stay usable standalone.

At 100 TB leaked cache is executor-memory pressure that evicts useful
blocks and eventually spills shuffles; the scope makes release the
default for composed pipelines. tests/test_ops.py asserts that a
multi-operator composition leaves `getPersistentRDDs()` empty.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

_scopes = threading.local()


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() that registers the handle with the innermost active
    cache_scope (if any) for release on scope exit."""
    persisted = df.persist() if storage_level is None else df.persist(storage_level)
    stack = getattr(_scopes, "stack", None)
    if stack:
        stack[-1].append(persisted)
    return persisted


@contextlib.contextmanager
def cache_scope():
    """Release every scoped_persist() made underneath, on exit.

    Yields the (mutable) list of persisted DataFrames registered so far,
    for callers that want to inspect or release entries early. Scopes
    nest; each scope releases only its own registrations. Thread-local:
    concurrent driver threads get independent scopes."""
    stack = getattr(_scopes, "stack", None)
    if stack is None:
        stack = _scopes.stack = []
    entries: list[DataFrame] = []
    stack.append(entries)
    try:
        yield entries
    finally:
        stack.pop()
        for df in entries:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
