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
    Spark reaches: ``relative/path:mtime_ms:size`` per file, sorted,
    ``|``-joined. Raises FileNotFoundError for an absent path instead of
    returning an empty string — an empty fingerprint is precisely the
    silent-staleness failure this helper exists to close.

    Keys are paths RELATIVE TO THE ROOT, not basenames (code review
    r14): a Hive-partitioned table has identically-named part files in
    every partition directory, and a same-name/same-size/same-mtime
    move between partitions must change the fingerprint.

    Resolution contract: Hadoop reports millisecond mtimes, so a
    same-size rewrite within one millisecond is invisible — strictly
    coarser than ``os.stat``'s nanoseconds. The round-16 dedup swap
    must therefore keep the os.stat path for LOCAL directories and use
    this only where os.stat cannot see at all (REVIEW_r14.md #2).

    Encoding contract (ADVICE r14): each per-file record is
    length-prefixed — ``len(rel):rel:mtime:size`` — so a path containing
    the ``:`` or ``|`` delimiters can never alias a different listing to
    the same joined string (two different content versions mapping to one
    fingerprint is exactly the failure class this helper closes; parquet
    part files never contain these characters, but the primitive must not
    depend on that)."""
    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    root = p.toUri().getPath()
    parts: list[str] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        fpath = st.getPath().toUri().getPath()
        rel = (
            fpath[len(root):].lstrip("/")
            if fpath.startswith(root)
            else fpath
        ) or fpath.rsplit("/", 1)[-1]
        parts.append(
            f"{len(rel)}:{rel}:{st.getModificationTime()}:{st.getLen()}"
        )
    parts.sort()
    return "|".join(parts)
