"""Per-user on-disk cache directories for derived artifacts (dedup
signature tables, staged media corpora).

One shared implementation of the security/keying discipline (extracted
round 10 after two near-copies diverged — code review finding):

- artifacts live under ``$TMPDIR/<prefix>_<uid>``, created 0o700, so
  another local user can neither read nor pre-plant content that passes
  validation (ADVICE r9);
- the base dir's OWNERSHIP is verified — a squatter pre-creating the
  predictable name yields a loud, actionable error instead of a
  confusing chmod/permission failure downstream;
- entries are keyed ``<path_tag>_<fp_tag>`` (md5 of the source's abs
  path / of its content fingerprint), so changed source content rotates
  the entry and stale fingerprints of the SAME source are safely
  prunable — by definition they describe outdated data.

The staged-media and landed-parquet caches share one LIFECYCLE protocol
too (consolidated here round 12 after the two ~50-line copies in
multimodal_synth.py / media_landing.py started to diverge — VERDICT r11
wrong #2):

- a ``_source.txt`` MARKER is written last, inside a pid-suffixed temp
  dir, and the complete dir is renamed into place (``publish_atomic``) —
  a reader sees the whole entry or none;
- ``prune_stale_entries`` reaps (a) stale fingerprints of the same
  source (outdated by definition), (b) published entries whose marker
  points at a vanished source (test fixtures live in pytest tmp dirs),
  (c) temp/marker-less dirs older than a grace age. A temp dir is aged
  REGARDLESS of any marker inside it — a crash between marker-write and
  rename must not immunize the orphan (code review r11) — and age is
  the NEWEST mtime found recursively, not the top-level dir's: a long
  legitimate write keeps its newest file fresh even when the top-level
  mtime has gone stale (ADVICE r11).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time


def per_user_cache_dir(prefix: str) -> str:
    """Create-or-reuse the per-user 0o700 cache base for ``prefix``."""
    uid = os.getuid() if hasattr(os, "getuid") else "u"
    base = os.path.join(tempfile.gettempdir(), f"{prefix}_{uid}")
    os.makedirs(base, mode=0o700, exist_ok=True)
    if hasattr(os, "getuid") and os.stat(base).st_uid != os.getuid():
        raise RuntimeError(
            f"cache dir {base} is owned by uid {os.stat(base).st_uid}, "
            f"not {os.getuid()} — another user pre-created the path; "
            "remove it or point TMPDIR elsewhere"
        )
    os.chmod(base, 0o700)  # pre-existing dir keeps the tight mode too
    return base


def content_tags(sf_dir: str) -> tuple[str, str]:
    """(path tag, content-fingerprint tag) for a fixture directory."""
    from .operators.dedup import _docs_fingerprint

    path_tag = hashlib.md5(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:12]
    fp_tag = hashlib.md5(_docs_fingerprint(sf_dir).encode()).hexdigest()[:12]
    return path_tag, fp_tag


#: Operator-chosen artifact root (REVIEW_r16 #6): when set, persisted
#: artifacts (dedup signatures, component labels, video frame hashes)
#: land under ``$SPARK_GRAFT_ARTIFACT_ROOT/<prefix>/<key>`` instead of
#: the driver-local per-user cache dir. A scheme-qualified URI
#: (hdfs://, s3a://, file://…) is passed straight through to the
#: artifact read/write paths, which already ride the Hadoop FS API —
#: this closes the "only the default location is local" deployment gap.
ARTIFACT_ROOT_ENV = "SPARK_GRAFT_ARTIFACT_ROOT"


def artifact_entry_path(prefix: str, sf_dir: str) -> str:
    """Deterministic parquet-artifact location per (table path, content
    fingerprint) under the ``prefix`` namespace — the shared prune-and-key
    loop behind the dedup signature, components-label and video frame-hash
    artifacts (consolidated round 16 after the third and fourth verbatim
    copies appeared — ADVICE r15; same lesson as the round-10/round-12
    consolidations above).

    A content change in the source table yields a NEW path, so a stale
    prior-run artifact can never answer for rewritten data; under
    LOCAL roots (one machine, one view of the source), stale
    fingerprints of the SAME source path — there by definition
    outdated — are pruned on the way in, bounding accumulation.
    Separate ``prefix`` namespaces keep artifact kinds from ever
    colliding.

    With ``SPARK_GRAFT_ARTIFACT_ROOT`` unset (every driver/test run to
    date) the location and prune behavior are byte-identical to the
    consolidated r16 helper. When the env var names an explicit root,
    entries move under ``<root>/<prefix>/`` — the production shape where
    the artifact store is a managed location (object store, HDFS) rather
    than the driver's $TMPDIR:

    - a LOCAL root keeps the local prune loop (stale fingerprints of the
      same source reaped on the way in) but skips the per-user ownership
      gate — an explicit root is the operator's own choice, not a
      world-shared predictable /tmp name (the ADVICE-r9 threat model);
    - a scheme-qualified root is returned as a URI and is NEVER pruned
      (r17, ADVICE r16): a shared remote root can be resolved by many
      drivers whose views of the source differ, and an on-resolution
      reap from ANY of them could delete the newer artifact another job
      is actively writing or reading — availability damage for zero
      correctness benefit, since the KEYING alone already guarantees a
      stale sibling can never answer for rewritten data. Retention of
      superseded fingerprints under a remote root is deployment-owned
      (lifecycle rules on the store), exactly like every other shared
      table location."""
    root = os.environ.get(ARTIFACT_ROOT_ENV)
    if root:
        return _rooted_entry_path(root, prefix, sf_dir)
    base = per_user_cache_dir(prefix)
    path_tag, fp_tag = content_tags(sf_dir)
    name = f"{path_tag}_{fp_tag}"
    for entry in os.listdir(base):
        if entry.startswith(f"{path_tag}_") and entry != name:
            shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
    return os.path.join(base, name)


def _rooted_entry_path(root: str, prefix: str, sf_dir: str) -> str:
    """``artifact_entry_path`` against an explicit operator-chosen root
    (local path or Hadoop-reachable URI). A LOCAL root keeps the
    stale-sibling prune (one machine, one view of the source — the
    per-user cache's semantics) with the base created 0o700 (ADVICE r16
    low: harmless under a trusted root, and keeps a misconfigured
    group-writable location from letting another local user pre-plant a
    validated-looking artifact). A REMOTE root is returned key-only —
    no pruning ever (see ``artifact_entry_path``: a shared root with
    multiple drivers makes any on-resolution reap an availability
    hazard; retention is deployment-owned)."""
    path_tag, fp_tag = content_tags(sf_dir)
    name = f"{path_tag}_{fp_tag}"
    if "://" not in root:
        base = os.path.join(os.path.abspath(root), prefix)
        os.makedirs(base, mode=0o700, exist_ok=True)
        for entry in os.listdir(base):
            if entry.startswith(f"{path_tag}_") and entry != name:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
        return os.path.join(base, name)
    return f"{root.rstrip('/')}/{prefix}/{name}"


MARKER_NAME = "_source.txt"

#: Marker-less or temp entries younger than this are CONCURRENT writes
#: in flight, not garbage; older ones are crashed and reaped.
GRACE_SECONDS = 3600.0


def newest_mtime(path: str) -> float:
    """Newest mtime anywhere under ``path`` (the path itself included).

    The top-level dir's mtime only moves on direct-child creation, so a
    long-running nested write (Spark's parquet committer stages parts in
    subdirectories) would look stale at the top while still live inside
    (ADVICE r11). Cache entries are small; the walk is bounded.
    """
    newest = os.stat(path).st_mtime
    for root, dirs, files in os.walk(path):
        for name in dirs + files:
            try:
                st = os.stat(os.path.join(root, name))
            except OSError:
                continue  # vanished mid-walk: a concurrent prune/rename
            newest = max(newest, st.st_mtime)
    return newest


def prune_stale_entries(
    base: str,
    keep_name: str,
    path_tag: str,
    temp_infix: str,
    grace_seconds: float = GRACE_SECONDS,
) -> None:
    """Reap outdated siblings of cache entry ``keep_name`` under ``base``.

    Three rules, shared by every directory-shaped cache namespace
    (staged media corpus, landed media parquet):

    - ``<path_tag>_<other_fp>`` (published, no dot): a stale fingerprint
      of the SAME source — outdated by definition, reaped immediately;
    - other published entries: reaped iff their marker names a source
      directory that no longer exists (dead test fixture);
    - temp dirs (``temp_infix`` in the name) and marker-less dirs: reaped
      only past the grace age. The marker must NOT immunize a temp dir —
      the marker is written last INSIDE the temp dir, so a process
      killed between marker-write and rename leaves a fully-marked
      orphan (code review r11). Age = recursive newest mtime, so a slow
      legitimate write stays protected as long as it keeps writing.
    """
    now = time.time()
    for entry in os.listdir(base):
        if entry == keep_name:
            continue
        full = os.path.join(base, entry)
        if entry.startswith(f"{path_tag}_") and "." not in entry:
            shutil.rmtree(full, ignore_errors=True)  # stale fingerprint
            continue
        if temp_infix not in entry:
            try:
                with open(os.path.join(full, MARKER_NAME)) as f:
                    if not os.path.isdir(f.read().strip()):
                        shutil.rmtree(full, ignore_errors=True)  # dead src
                continue
            except OSError:
                pass  # no marker: crashed OR concurrent — age-gate below
        try:
            if now - newest_mtime(full) > grace_seconds:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            pass  # vanished under us: someone else's rename/prune won


def publish_atomic(tmp: str, out: str) -> None:
    """Atomically publish temp dir ``tmp`` as cache entry ``out``.

    The caller has already written the marker (last) inside ``tmp``.
    A concurrent publisher losing the rename race discards its copy and
    uses the winner's — but only if the winner actually finished (its
    marker exists); any other rename failure propagates.
    """
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(out, MARKER_NAME)):
            raise
