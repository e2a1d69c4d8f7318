"""searty_ray — Ray-Data-native inverted-index build + BM25 query engine."""

from __future__ import annotations


def _tune_allocator() -> None:
    """Keep large numpy buffers inside the process heap.

    glibc serves >128KB allocations via mmap and munmaps them on free, so
    every sizeable numpy temporary pays first-touch page faults again — on
    this class of sandboxed hosts that is the dominant cost of the encode
    stage (measured ~40×).  Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes
    freed buffers reusable.  Runs once per process (drivers AND Ray workers
    import this package).
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # noqa: BLE001 — non-glibc platforms: harmless no-op
        pass


_tune_allocator()

def worker_setup() -> None:
    """`ray.init(runtime_env={"worker_process_setup_hook": ...})` target:
    installs the log filter in EVERY worker (shuffle/join aggregator
    actors never import this package, so the import-time install below
    does not reach them)."""
    _quiet_schema_hash_warning()


def _quiet_schema_hash_warning() -> None:
    """Silence Ray Data's per-block "Failed to hash the schemas (for
    deduplication)" warning.  pyarrow schemas that carry metadata (the
    pandas blob every parquet writer attaches) are unhashable, so the
    read operator itself emits one warning line per block on EVERY
    metadata-carrying parquet read — pure noise we cannot fix at the
    source (the inputs are read-only).  Join/exchange inputs are
    additionally metadata-STRIPPED (`joins.strip_schema_metadata`) so
    schema deduplication actually works there; this only mutes the
    unfixable read-side line.  Runs in every process that imports the
    package (drivers AND Ray workers)."""
    import logging

    class _DropSchemaHashWarning(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_DropSchemaHashWarning())


_quiet_schema_hash_warning()
