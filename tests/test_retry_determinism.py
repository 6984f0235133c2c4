"""Task-retry determinism (round 16): results must be byte-identical
when task attempts fail and retry — the cluster blip every other axis
assumes away. See scripts/retry_determinism_probe.py for the full
rationale; it runs as a SUBPROCESS because the retry-enabled master
(``local[8, 3]``) cannot coexist with the suite's shared ``local[32]``
JVM (the master is fixed at first-session creation per process)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_retry_determinism_probe():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "retry_determinism_probe.py")],
        capture_output=True,
        text=True,
        timeout=400,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    record = json.loads(proc.stdout.strip().splitlines()[-1])
    # the injection must actually have fired (>0 failed attempts) AND
    # every shape must match the clean run exactly — both are folded
    # into "ok", but assert the parts so a failure names the culprit
    assert record["attempts_failed"] > 0
    for shape, res in record["shapes"].items():
        assert res["identical"] and res["rows"] > 0, (shape, res)
    assert record["ok"]
