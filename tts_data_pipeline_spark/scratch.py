"""Scratch-space allocation for staging writes and iteration state.

Several operators stage intermediate files: the partitioned MERGE and its
compaction (Spark refuses to overwrite a path present in the read plan, so
touched partitions round-trip through a staging dir), the scan/sink
round-trip catalog entries, and the connected-components iteration state.
On a cluster those paths must live on the SAME filesystem as the tables
they stage for (HDFS/S3 scratch prefix, not executor-local /tmp), or the
staged-write + re-read round-trip silently crosses filesystems.

Resolution order for the scratch ROOT:

1. an explicit ``scratch_dir=`` argument on the calling operator,
2. the ``SPARK_GRAFT_SCRATCH_DIR`` environment variable,
3. the platform tempdir (``tempfile``) — correct for local[*].

Each call still allocates a FRESH unique subdirectory under the root
(concurrent merges must never share staging paths); the caller owns
deletion exactly as before.
"""

from __future__ import annotations

import os
import tempfile

ENV_VAR = "SPARK_GRAFT_SCRATCH_DIR"


def scratch_mkdtemp(prefix: str, scratch_dir: str | None = None) -> str:
    """Allocate a unique scratch directory under the resolved root."""
    root = scratch_dir or os.environ.get(ENV_VAR)
    if root:
        os.makedirs(root, exist_ok=True)
        return tempfile.mkdtemp(prefix=prefix, dir=root)
    return tempfile.mkdtemp(prefix=prefix)
