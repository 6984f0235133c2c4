"""Scheme-agnostic file metadata through the Hadoop FS API.

Round-16 prep (REVIEW_r14.md #2): ``dedup._docs_fingerprint`` walks the
documents table with ``os.stat``/``os.walk``, which silently returns an
EMPTY fingerprint for any non-local scheme (hdfs://, s3a://, …) — every
content version of a remote corpus then maps to the same persisted
signature artifact and memo key, defeating the staleness checks. This
module provides the replacement primitive now, tested and staged, so
the round-16 edit to the certified dedup module (scheduled for the
r13-block rotation, the zero-cost re-cert moment) is a one-line swap.

Kept OUT of dedup.py deliberately this round: importing it there would
change certified executable paths mid-window."""

from __future__ import annotations

from pyspark.sql import SparkSession

from .sources.layout import _hadoop_fs


def fs_content_fingerprint(spark: SparkSession, path: str) -> str:
    """Cheap content fingerprint of a file or directory on ANY scheme
    Spark reaches: ``name:mtime_ms:size`` per file, sorted by path,
    ``|``-joined. Raises FileNotFoundError for an absent path instead of
    returning an empty string — an empty fingerprint is precisely the
    silent-staleness failure this helper exists to close.

    Scale note: one Hadoop ``listFiles(recursive)`` round trip per call
    — O(#files) metadata, no data reads; at 100 TB this is the same
    listing every scan's split planning already performs."""
    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    parts: list[str] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        fp = st.getPath()
        parts.append(
            f"{fp.getName()}:{st.getModificationTime()}:{st.getLen()}"
        )
    parts.sort()
    return "|".join(parts)
