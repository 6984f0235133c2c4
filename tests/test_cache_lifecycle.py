"""Decision-matrix test for the consolidated cache lifecycle
(cache.py prune_stale_entries / publish_atomic / newest_mtime): one
table covering every (entry kind × age) cell for BOTH temp infixes, so
the shared implementation can never silently drop a rule one of its two
call sites (multimodal_synth, media_landing) used to enforce locally."""

from __future__ import annotations

import os
import time

import pytest

from duckdb_parquet_parser_spark.cache import (
    GRACE_SECONDS,
    MARKER_NAME,
    newest_mtime,
    prune_stale_entries,
    publish_atomic,
)

PATH_TAG = "aaaaaaaaaaaa"
KEEP = f"{PATH_TAG}_bbbbbbbbbbbb"


def _make(base, name, *, marker=None, aged=False, nested_fresh=False):
    full = os.path.join(base, name)
    os.makedirs(full, exist_ok=True)
    with open(os.path.join(full, "payload.bin"), "wb") as f:
        f.write(b"x" * 8)
    if marker is not None:
        with open(os.path.join(full, MARKER_NAME), "w") as f:
            f.write(marker)
    if nested_fresh:
        sub = os.path.join(full, "_temporary", "0")
        os.makedirs(sub, exist_ok=True)
        with open(os.path.join(sub, "part-0"), "w") as f:
            f.write("live")
    if aged:
        past = time.time() - GRACE_SECONDS - 120
        for root, dirs, files in os.walk(full, topdown=False):
            for n in dirs + files:
                if nested_fresh and n in ("_temporary", "0", "part-0"):
                    continue
                os.utime(os.path.join(root, n), (past, past))
        if not nested_fresh:
            os.utime(full, (past, past))
    return full


@pytest.mark.parametrize("infix", [".staging.", ".landing."])
def test_prune_decision_matrix(tmp_path, infix):
    base = str(tmp_path)
    live_src = str(tmp_path / "live_src")
    os.makedirs(live_src)

    keep = _make(base, KEEP, marker=live_src)
    cases = {
        # (survives?) published entries
        "stale_fp": (_make(base, f"{PATH_TAG}_cccccccccccc"), False),
        "other_live": (
            _make(base, "ffffffffffff_dddddddddddd", marker=live_src),
            True,
        ),
        "other_dead": (
            _make(
                base,
                "eeeeeeeeeeee_dddddddddddd",
                marker=str(tmp_path / "gone"),
            ),
            False,
        ),
        # temp dirs: age decides, marker must NOT immunize
        "temp_fresh": (
            _make(base, f"cccccccccccc_ffffffffffff{infix}111"),
            True,
        ),
        "temp_fresh_marked": (
            _make(
                base,
                f"cccccccccccc_eeeeeeeeeeee{infix}222",
                marker=live_src,
            ),
            True,
        ),
        "temp_old": (
            _make(base, f"cccccccccccc_dddddddddddd{infix}333", aged=True),
            False,
        ),
        "temp_old_marked": (
            _make(
                base,
                f"cccccccccccc_bbbbbbbbbbbb{infix}444",
                marker=live_src,
                aged=True,
            ),
            False,
        ),
        # slow live write: stale top, fresh nested file — must survive
        "temp_old_nested_fresh": (
            _make(
                base,
                f"cccccccccccc_aaaaaaaaaaaa{infix}555",
                aged=True,
                nested_fresh=True,
            ),
            True,
        ),
        # marker-less published-shaped dir (crashed rename w/o marker):
        # fresh survives, old is reaped — but a dot in the name keeps it
        # out of the stale-fingerprint fast path
        "markerless_fresh": (
            _make(base, "dddddddddddd_aaaaaaaaaaaa.x"),
            True,
        ),
        "markerless_old": (
            _make(base, "bbbbbbbbbbbb_aaaaaaaaaaaa.y", aged=True),
            False,
        ),
    }

    prune_stale_entries(base, KEEP, PATH_TAG, temp_infix=infix)

    assert os.path.exists(keep), "the keep entry itself was reaped"
    for label, (path, survives) in cases.items():
        assert os.path.exists(path) == survives, (label, infix)


def test_publish_atomic_loser_discards_and_winner_stands(tmp_path):
    out = str(tmp_path / "entry")
    # winner publishes
    tmp1 = str(tmp_path / "entry.staging.1")
    os.makedirs(tmp1)
    with open(os.path.join(tmp1, MARKER_NAME), "w") as f:
        f.write("src")
    publish_atomic(tmp1, out)
    assert os.path.isdir(out) and not os.path.exists(tmp1)
    stamp = os.stat(os.path.join(out, MARKER_NAME)).st_mtime_ns
    # loser: rename fails (out exists, non-empty on POSIX), copy discarded
    tmp2 = str(tmp_path / "entry.staging.2")
    os.makedirs(tmp2)
    with open(os.path.join(tmp2, MARKER_NAME), "w") as f:
        f.write("src")
    publish_atomic(tmp2, out)
    assert not os.path.exists(tmp2)
    assert os.stat(os.path.join(out, MARKER_NAME)).st_mtime_ns == stamp


def test_publish_atomic_raises_when_no_winner(tmp_path):
    """A rename failure with NO completed winner must propagate — eating
    it would turn a permissions/cross-device error into silent data
    loss."""
    out = str(tmp_path / "blocked" / "entry")  # parent doesn't exist
    tmp = str(tmp_path / "entry.staging.9")
    os.makedirs(tmp)
    with open(os.path.join(tmp, MARKER_NAME), "w") as f:
        f.write("src")
    with pytest.raises(OSError):
        publish_atomic(tmp, out)


def test_newest_mtime_sees_nested_writes(tmp_path):
    d = str(tmp_path / "d")
    sub = os.path.join(d, "a", "b")
    os.makedirs(sub)
    past = time.time() - 9999
    os.utime(os.path.join(d, "a"), (past, past))
    os.utime(d, (past, past))
    with open(os.path.join(sub, "f"), "w") as f:
        f.write("fresh")
    assert time.time() - newest_mtime(d) < 60


def test_artifact_entry_path_keys_and_prunes(tmp_path, monkeypatch):
    """The consolidated artifact keying helper (r16, ADVICE r15): same
    content → same path; rewritten content → NEW path AND the stale
    sibling of the same source is pruned on the way in; prefixes are
    disjoint namespaces; unrelated sources are never touched."""
    import tempfile

    from duckdb_parquet_parser_spark.cache import artifact_entry_path

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None  # force gettempdir() to re-read TMPDIR
    try:
        src = tmp_path / "fixture"
        src.mkdir()
        (src / "documents.parquet").write_bytes(b"v1" * 10)

        p1 = artifact_entry_path("sg_test", str(src))
        assert p1 == artifact_entry_path("sg_test", str(src))  # stable
        os.makedirs(p1)

        # a second SOURCE must not collide or be pruned by the first
        other = tmp_path / "other"
        other.mkdir()
        (other / "documents.parquet").write_bytes(b"zz")
        p_other = artifact_entry_path("sg_test", str(other))
        assert os.path.dirname(p_other) == os.path.dirname(p1)
        assert p_other != p1
        os.makedirs(p_other)

        # rewrite the first source's content: new key, old entry pruned,
        # the unrelated source's entry untouched
        (src / "documents.parquet").write_bytes(b"v2-bigger" * 10)
        p2 = artifact_entry_path("sg_test", str(src))
        assert p2 != p1
        assert not os.path.exists(p1)  # stale fingerprint reaped
        assert os.path.exists(p_other)  # different path tag survives

        # namespace separation: another prefix lives in its own base
        p3 = artifact_entry_path("sg_test2", str(src))
        assert os.path.dirname(p3) != os.path.dirname(p2)
    finally:
        tempfile.tempdir = None  # don't leak the patched TMPDIR cache


def test_artifact_root_override_local(tmp_path, monkeypatch):
    """REVIEW_r16 #6: with SPARK_GRAFT_ARTIFACT_ROOT set to a LOCAL path,
    entries move under <root>/<prefix>/ with the same keying and the same
    stale-sibling prune; the default $TMPDIR location is never touched."""
    from duckdb_parquet_parser_spark.cache import (
        ARTIFACT_ROOT_ENV,
        artifact_entry_path,
    )

    src = tmp_path / "fixture"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"v1" * 10)
    root = tmp_path / "store"

    monkeypatch.setenv(ARTIFACT_ROOT_ENV, str(root))
    p1 = artifact_entry_path("sg_test", str(src))
    assert p1 == artifact_entry_path("sg_test", str(src))  # stable
    assert os.path.dirname(p1) == str(root / "sg_test")
    os.makedirs(p1)

    # rewritten source content: new key, stale sibling reaped under root
    (src / "documents.parquet").write_bytes(b"v2-bigger" * 10)
    p2 = artifact_entry_path("sg_test", str(src))
    assert p2 != p1 and not os.path.exists(p1)

    # prefixes stay disjoint namespaces under the root
    p3 = artifact_entry_path("sg_test2", str(src))
    assert os.path.dirname(p3) == str(root / "sg_test2")

    # and unsetting the env returns to the per-user default location
    monkeypatch.delenv(ARTIFACT_ROOT_ENV)
    assert str(root) not in artifact_entry_path("sg_test", str(src))


def test_artifact_root_override_uri_is_key_only(tmp_path, monkeypatch):
    """A scheme-qualified root resolves to a pure key-derived URI with NO
    filesystem interaction at all (r17, ADVICE r16): a shared remote
    root can be resolved by many drivers, so resolution must never
    list, prune, or otherwise touch the store — a sibling fingerprint
    another driver is writing stays untouched, and resolution works
    with or without an active SparkSession. Keying alone guarantees a
    stale sibling can never answer for current data; retention is
    deployment-owned. (Previously this probed a no-session no-op branch
    and silently self-skipped in full-suite runs — ADVICE r16 low.)"""
    from duckdb_parquet_parser_spark.cache import (
        ARTIFACT_ROOT_ENV,
        artifact_entry_path,
        content_tags,
    )

    src = tmp_path / "fixture"
    src.mkdir()
    (src / "documents.parquet").write_bytes(b"v1" * 10)

    monkeypatch.setenv(ARTIFACT_ROOT_ENV, f"file://{tmp_path}/store")
    path_tag, fp_tag = content_tags(str(src))
    want = f"file://{tmp_path}/store/sg_test/{path_tag}_{fp_tag}"
    assert artifact_entry_path("sg_test", str(src)) == want

    # a pre-existing sibling fingerprint under the remote root survives
    # resolution (no on-resolution reap — another driver may own it)
    store = tmp_path / "store" / "sg_test"
    sibling = store / f"{path_tag}_deadbeef"
    sibling.mkdir(parents=True)
    (sibling / "part-0.parquet").write_bytes(b"other driver")
    assert artifact_entry_path("sg_test", str(src)) == want
    assert sibling.exists()
