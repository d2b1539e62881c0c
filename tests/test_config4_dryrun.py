"""BASELINE config[4] scale-evidence script smoke (round-5 VERDICT #9).

The committed artifact (docs/config4_dryrun.json) is produced by
scripts/config4_dryrun.py at 16,384 envs; this smoke runs the same
script end-to-end at reduced size so regressions in the sharded
joint-task iteration or the memory accounting surface in CI.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_config4_dryrun_smoke(tmp_path):
    out = tmp_path / "config4.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "config4_dryrun.py"),
         "--envs", "64", "--devices", "8", "--horizon", "2",
         "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    d = json.loads(out.read_text())
    assert d["task"] == "humanoid_joint_deploy"
    assert d["envs"] == 64 and d["devices"] == 8
    import math

    assert math.isfinite(d["value_loss"])
    # sharded env state is balanced across the non-zero devices
    per = d["per_device_live_bytes_after_setup"]
    assert len(per) == 8
    vals = [v for k, v in sorted(per.items())][1:]  # dev 0 holds replicas
    assert max(vals) < 2 * min(vals)
    # the committed 16k artifact exists and projects under the HBM budget
    full = json.load(open(os.path.join(REPO, "docs", "config4_dryrun.json")))
    assert full["envs"] == 16384
    assert full["projection_T60_per_device_bytes"] < 16e9
