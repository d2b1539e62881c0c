"""Python front-end for the native (C++) batch sim2sim evaluator.

Builds `native/hgt_sim2sim_eval` on demand (links the libmujoco inside the
python wheel) and runs parallel MuJoCo rollouts of an exported policy.bin —
the framework's eval farm (~40x the single-threaded Python sim2sim loop).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import tempfile
from typing import List, Optional

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
BINARY = os.path.join(NATIVE_DIR, "hgt_sim2sim_eval")


def ensure_built() -> str:
    if not os.path.exists(BINARY):
        subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
    return BINARY


def _mujoco3_compat_xml(model_path: str) -> str:
    """Write a MuJoCo-3.x-compatible copy of a 2.3-era MJCF (same fixes as
    export/sim2sim.py:_load_mj_model) and return its path."""
    xml = open(model_path).read()
    xml = re.sub(r'\s*sensornoise="[^"]*"', "", xml)
    xml = re.sub(r"\s*iterations='[^']*'", "", xml)
    m = re.search(r'meshdir="([^"]*)"', xml)
    if m:
        absdir = os.path.normpath(
            os.path.join(os.path.dirname(os.path.abspath(model_path)), m.group(1))
        )
        xml = xml.replace(m.group(0), f'meshdir="{absdir}"')
    fd, out = tempfile.mkstemp(suffix=".xml")
    with os.fdopen(fd, "w") as f:
        f.write(xml)
    return out


def run_eval_farm(
    model_path: str,
    policy_bin: str,
    rollouts: int = 8,
    duration: float = 10.0,
    threads: Optional[int] = None,
    vx: float = 0.4,
    vy: float = 0.0,
    dyaw: float = 0.0,
    seed: int = 0,
) -> dict:
    """Returns {"rollouts": [...], "summary": {...}}."""
    binary = ensure_built()
    xml = _mujoco3_compat_xml(model_path)
    cmd = [
        binary,
        "--model", xml,
        "--policy", policy_bin,
        "--rollouts", str(rollouts),
        "--duration", str(duration),
        "--vx", str(vx),
        "--vy", str(vy),
        "--dyaw", str(dyaw),
        "--seed", str(seed),
    ]
    if threads:
        cmd += ["--threads", str(threads)]
    out = subprocess.run(cmd, check=True, capture_output=True, text=True)
    rolls: List[dict] = []
    summary = {}
    for line in out.stdout.splitlines():
        rec = json.loads(line)
        if rec.get("summary"):
            summary = rec
        else:
            rolls.append(rec)
    os.unlink(xml)
    return {"rollouts": rolls, "summary": summary}
