"""Per-document file export (SURVEY.md §2.2 K1/K2).

The reference writes one ``.md`` file per converted document
(`/root/reference/src/managers/markdown_conversion_manager.py:106-108`)
and one ``.png`` per extracted figure
(`/root/reference/src/managers/image_manager.py:200-219`). The engine's
primary sink is table columns (text/binary in parquet — the right call
at 100 TB), but file-on-disk parity is still wanted for interop with
downstream tools that expect a folder of markdown/images.

``export_files`` is that optional sink: a distributed
``foreachPartition`` writer — every executor writes its own partition's
rows straight to the target filesystem, no driver collect, no shuffle.

Scale notes:
- The target directory must be a filesystem every executor can reach
  (shared FS / fuse mount — the same assumption the reference's
  ``output_folder`` makes). On executor-local disks the files would
  land scattered across nodes.
- Writes are atomic per file (temp file + ``os.replace``), so
  speculative / retried tasks are idempotent: both attempts write the
  same deterministic content and the last rename wins with no torn
  files.
- One small file per document is an anti-pattern for *analytics* at
  100 TB (that is why the table column is the primary sink) but is the
  contract for *export*; callers control fan-out by choosing what they
  export (e.g. one shard of documents at a time).
"""

from __future__ import annotations

import os
import posixpath

from pyspark.sql import DataFrame


def _safe_join(root: str, rel: str) -> str:
    """Join ``rel`` under ``root``, refusing path traversal outside it."""
    rel = rel.lstrip("/")
    dest = os.path.normpath(os.path.join(root, rel))
    root_norm = os.path.normpath(root)
    if not (dest == root_norm or dest.startswith(root_norm + os.sep)):
        raise ValueError(f"export path escapes target dir: {rel!r}")
    return dest


def export_files(
    df: DataFrame,
    out_dir: str,
    path_col: str = "relpath",
    content_col: str = "content",
) -> None:
    """Write one file per row: ``out_dir/<path_col>`` <- ``content_col``.

    ``content_col`` may be string (markdown, JSON — K1-style) or binary
    (PNG bytes — K2-style); the writer picks text/binary mode per row.
    Rows with a null path or null content are skipped (error-tolerant,
    matching the reference's per-record error policy at
    `/root/reference/src/etl_processor.py:109-111`).
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows) -> None:
        for row in rows:
            rel = row[path_col]
            data = row[content_col]
            if rel is None or data is None:
                continue
            dest = _safe_join(out_dir, posixpath.normpath(rel))
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            tmp = f"{dest}.__tmp_{os.getpid()}"
            if isinstance(data, (bytes, bytearray)):
                with open(tmp, "wb") as fh:
                    fh.write(bytes(data))
            else:
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write(str(data))
            os.replace(tmp, dest)

    df.select(path_col, content_col).foreachPartition(write_partition)
