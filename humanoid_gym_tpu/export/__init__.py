"""Deployment export + MuJoCo sim2sim validation.

Replaces the reference's TorchScript-only deployment path
(humanoid/utils/helpers.py:248-253 export_policy_as_jit) with two artifacts:
- a torch-free NumPy MLP (.npz) — the portable deployment format
- an optional TorchScript actor identical in layout to the reference's
  policy_example.pt, so downstream consumers of the reference can load ours.

The sim2sim module replays either artifact in MuJoCo (CPU, independent
engine), reproducing the deployment observation contract byte-for-byte
(reference scripts/sim2sim.py — SURVEY §3.4).
"""

from .policy_export import NumpyPolicy, export_policy, load_policy

__all__ = ["NumpyPolicy", "export_policy", "load_policy"]
