"""Build-once on-disk cache for derived input corpora (replay chunks,
wire/JSONL/CSV copies of the test tables) — shared infrastructure for
the streaming, sources, and bench layers.

Each cache entry is a directory keyed by a content fingerprint of its
inputs plus build parameters; builds run into a temp dir and publish
with an atomic rename, so concurrent builders race harmlessly (the
loser's work is discarded, the winner's identical dir is used). The
point: expensive one-time Spark jobs (chunking, envelope encoding,
format conversion) run once per (corpus, params), not once per query.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def fast_scratch_root() -> str:
    """Root for EPHEMERAL per-query scratch (stream checkpoints, sink
    output dirs) — distinct from the persistent build-once cache above.

    These directories live only for the duration of one query and their
    contents are never a result, so they belong on the fastest local
    volume available: stream-checkpoint commits are dozens of small
    fsync'd files per micro-batch and sink round-trips are
    write-then-read-back, both dominated by local-FS metadata latency
    on the repo volume. Override with ``SPARK_GRAFT_SCRATCH``; a real
    deployment points streaming checkpoints at durable cluster storage
    instead (the checkpointLocation would be a config there — this
    harness's checkpoints are torn down with the query, so durability
    buys nothing)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        root = os.path.join(shm, "ukis_scratch")
        os.makedirs(root, exist_ok=True)
        return root
    os.makedirs(_SCRATCH, exist_ok=True)
    return _SCRATCH


def cache_publish(build_fn, digest_key: tuple) -> str:
    """Run ``build_fn(into_dir)`` once per ``digest_key`` and return the
    published cache directory (existing entries return immediately)."""
    cache_root = os.path.join(_SCRATCH, "replay_cache")
    os.makedirs(cache_root, exist_ok=True)
    digest = hashlib.sha256(repr(digest_key).encode()).hexdigest()[:16]
    final = os.path.join(cache_root, digest)
    if not os.path.isdir(final):
        build = tempfile.mkdtemp(prefix="build_", dir=cache_root)
        try:
            build_fn(build)
            try:
                os.rename(build, final)
            except OSError:
                if not os.path.isdir(final):  # not a lost race: real failure
                    raise
        finally:
            shutil.rmtree(build, ignore_errors=True)
    return final


def table_fingerprint(sf_dir: str, table: str = "events") -> tuple:
    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    return (os.path.abspath(sf_dir), table, st.st_size, st.st_mtime_ns)
