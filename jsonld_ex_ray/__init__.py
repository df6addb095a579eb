"""jsonld_ex_ray — Ray-Data-native JSON-LD / KG-construction engine.

Importing the package preloads the vectorized-kernel dependencies
(polars / numpy / pyarrow.compute) so every Ray worker pays the import
cost during its FIRST task (usually the long extraction stage) instead of
stalling the first wide-stage task that needs them.
"""

import numpy  # noqa: F401  (preload)
import polars  # noqa: F401  (preload)
import pyarrow.compute  # noqa: F401  (preload)


def _stabilize_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import deterministic.

    Ray Data's path resolution tries ``from fsspec.implementations.http
    import HTTPFileSystem`` on every read/write (guarded by ``except
    ModuleNotFoundError``). When aiohttp is absent that import FAILS —
    and a failed import is not cached, so every Dataset write re-runs it.
    Two threads racing the doomed import can observe a partially
    initialized module and get ``ImportError: cannot import name
    'HTTPFileSystem'`` instead of ModuleNotFoundError, escaping Ray's
    guard (seen as a flaky failure in concurrent run_checkpointed
    writers). Cache a minimal stub once so the import always succeeds;
    this engine never touches http:// paths, and the stub only ever
    participates in isinstance checks that correctly return False.
    """
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401  (real module)
        return
    except ImportError:
        pass
    try:
        import fsspec
        import fsspec.implementations
    except ImportError:  # no fsspec at all: Ray's guard handles it
        return

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem(fsspec.AbstractFileSystem):  # pragma: no cover
        protocol = ("http", "https")

        def __init__(self, *a, **kw):
            # the stub exists only so the import is deterministic and
            # isinstance checks return False; anyone actually building an
            # http filesystem still gets the actionable dependency error,
            # not a nonfunctional AbstractFileSystem
            raise ImportError(
                "HTTPFileSystem requires aiohttp, which is not installed "
                "(stub registered by jsonld_ex_ray for import stability)"
            )

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    fsspec.implementations.http = mod


_stabilize_fsspec_http()


def _silence_empty_schema_divergence_warning() -> None:
    """Drop Ray's schema-divergence warning ONLY for the empty-new-schema
    artifact, keeping real schema drift visible.

    Ray's sort-based shuffle (under every ``groupby``) builds an output
    partition that received zero rows as a ZERO-COLUMN table
    (``merge_sorted_blocks`` → ``_empty_table()`` →
    ``pyarrow_table_from_pydict({})`` in
    ray/data/_internal/arrow_block.py), so any bucketed op whose range
    partitions outnumber its distinct keys logs "Operator produced a
    RefBundle with a different schema … new schema: ." once per
    operator. That warning is noise from Ray's internals — our bucket
    kernels emit schema-stable empty tables — and worse, it sets the
    once-per-operator warned flag, masking REAL drift. A real divergence
    (non-empty new schema) still logs; only the empty-new-schema form
    (str(empty schema) == "") is filtered."""
    import logging

    class _EmptyNewSchemaFilter(logging.Filter):
        _NEEDLE = "new schema: . This may lead"

        def filter(self, record: logging.LogRecord) -> bool:  # pragma: no cover
            try:
                return self._NEEDLE not in record.getMessage()
            except Exception:
                return True

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyNewSchemaFilter())


_silence_empty_schema_divergence_warning()
