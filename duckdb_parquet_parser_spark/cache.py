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
"""

from __future__ import annotations

import hashlib
import os
import tempfile


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
