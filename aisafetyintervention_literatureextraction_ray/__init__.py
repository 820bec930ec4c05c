"""Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the semantics of
``jonpsy/AISafetyIntervention_LiteratureExtraction`` (reference at
``/root/reference``, surveyed in ``SURVEY.md``) as a streaming Ray Data
pipeline: triple extraction -> entity linking -> canonicalization ->
graph materialization over interleaved text+media documents.

Everything is expressed as ``ray.data.Dataset`` transforms over
zero-copy Arrow batches; stateful stages are actor pools; the only
shuffles are the three keyed group-bys documented in SURVEY.md §4.3
(node dedup, edge dedup, near-dup bucketing).
"""

__version__ = "0.1.0"


def _shim_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable without aiohttp.

    Ray Data's path resolution lazily does ``from
    fsspec.implementations.http import HTTPFileSystem`` on EVERY read and
    write.  In this environment aiohttp is absent, so the import fails —
    and because failed imports are retried, two driver threads importing
    it concurrently race on the partially-initialized module and crash
    with a spurious ImportError.  Installing a dummy module (whose
    ``HTTPFileSystem`` nothing can be an instance of) makes the import
    deterministic and thread-safe; no HTTP filesystems exist here.
    """
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # dummy sentinel class
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    try:
        import fsspec.implementations

        fsspec.implementations.http = mod
    except ImportError:
        pass


def _silence_schema_hash_noise() -> None:
    """Drop Ray Data's "Failed to hash the schemas (for deduplication)"
    log line.

    ``transform_pyarrow.unify_schemas`` tries ``set(schemas)`` as a
    fast-path and logs a WARNING whenever a schema is unhashable — which
    is every schema carrying pandas footer metadata (any parquet written
    by pandas), on every block merge.  The warning is informational
    (unification proceeds on the slow path), but it floods worker logs
    and buries real regressions; filter exactly that message.
    """
    import logging

    class _Drop(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logger = logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow")
    if not any(type(f).__name__ == "_Drop" for f in logger.filters):
        logger.addFilter(_Drop())

    class _DropEmptySchemaDivergence(logging.Filter):
        """Drop ONLY the empty-new-schema variant of the executor's
        schema-divergence warning: a 0-row bucket from a per-bucket
        merge/group map legitimately yields a column-less block
        ("new schema: .") and the executor unifies on; a REAL schema
        divergence (non-empty differing schema) still logs."""

        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not ("different schema" in msg
                        and "new schema: ." in msg)

    exec_logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(type(f).__name__ == "_DropEmptySchemaDivergence"
               for f in exec_logger.filters):
        exec_logger.addFilter(_DropEmptySchemaDivergence())

    # Coverage note: this import-time install reaches every worker that
    # deserializes a UDF referencing this package (cloudpickle imports
    # the module), i.e. all hot-path workers.  Pure read/shuffle tasks
    # can still log one line.  ``runtime_env={"worker_process_setup_
    # hook": ...}`` would cover those too, but it HANGS ray.init in
    # this sandbox (local mode, no runtime-env agent) — measured, not
    # assumed — so the session owners deliberately don't pass it.


_shim_fsspec_http()
_silence_schema_hash_noise()
