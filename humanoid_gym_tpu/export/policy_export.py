"""Policy export: flax params -> NumPy MLP artifact (+ optional TorchScript).

The actor is a plain ELU MLP (networks.py); deployment needs no framework.
NumpyPolicy.forward is the reference obs->action contract: deterministic
mean (reference actor_critic.py:122-124 act_inference).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


class NumpyPolicy:
    """Torch/JAX-free actor MLP: obs (705,) -> action (12,)."""

    def __init__(self, weights: List[Tuple[np.ndarray, np.ndarray]]):
        self.weights = weights  # [(W, b), ...] with W shaped (in, out)

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        x = np.asarray(obs, np.float32)
        n = len(self.weights)
        for i, (W, b) in enumerate(self.weights):
            x = x @ W + b
            if i < n - 1:
                x = np.where(x > 0, x, np.expm1(x))  # ELU
        return x


def _actor_layers(params) -> List[Tuple[np.ndarray, np.ndarray]]:
    actor = params["params"]["actor"]
    layers = sorted(actor.keys(), key=lambda k: int(k.split("_")[-1]))
    return [
        (np.asarray(actor[k]["kernel"]), np.asarray(actor[k]["bias"])) for k in layers
    ]


def export_policy(params, path: str, torchscript: bool = True) -> List[str]:
    """Write <path>/policy.npz (+ policy_jit.pt if torch available).

    Returns the written file paths. Mirrors the reference export location
    contract (play.py:81-84: logs/<exp>/exported/policies).
    """
    os.makedirs(path, exist_ok=True)
    written = []
    layers = _actor_layers(params)
    npz = {}
    for i, (W, b) in enumerate(layers):
        npz[f"W{i}"] = W
        npz[f"b{i}"] = b
    npz["n_layers"] = np.asarray(len(layers))
    f_npz = os.path.join(path, "policy.npz")
    np.savez(f_npz, **npz)
    written.append(f_npz)

    # flat binary for the native (C++) evaluator: "HGTP", n_layers, then per
    # layer (in_dim, out_dim) int32 + row-major float32 W + float32 b
    f_bin = os.path.join(path, "policy.bin")
    with open(f_bin, "wb") as f:
        f.write(b"HGTP")
        f.write(np.asarray([len(layers)], np.int32).tobytes())
        for W, b in layers:
            f.write(np.asarray(W.shape, np.int32).tobytes())
            f.write(np.ascontiguousarray(W, np.float32).tobytes())
            f.write(np.ascontiguousarray(b, np.float32).tobytes())
    written.append(f_bin)

    if torchscript:
        try:
            written.append(_export_torchscript(layers, path))
        except Exception as e:  # torch missing or scripting failure
            print(f"[export] TorchScript export skipped: {e}")
    return written


def _export_torchscript(layers, path: str) -> str:
    """TorchScript artifact compatible with the reference deployment loader
    (sim2sim.py:192 torch.jit.load)."""
    import torch
    import torch.nn as nn

    mods: List[nn.Module] = []
    for i, (W, b) in enumerate(layers):
        lin = nn.Linear(W.shape[0], W.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(W.T).copy()))
            lin.bias.copy_(torch.from_numpy(np.asarray(b).copy()))
        mods.append(lin)
        if i < len(layers) - 1:
            mods.append(nn.ELU())
    actor = nn.Sequential(*mods)
    scripted = torch.jit.script(actor)
    f = os.path.join(path, "policy_jit.pt")
    scripted.save(f)
    return f


def load_policy(path: str) -> NumpyPolicy:
    """Load a policy artifact: .npz (ours) or TorchScript .pt (ours or the
    reference's shipped policy_example.pt)."""
    if path.endswith(".npz"):
        data = np.load(path)
        n = int(data["n_layers"])
        return NumpyPolicy([(data[f"W{i}"], data[f"b{i}"]) for i in range(n)])
    # TorchScript fallback
    import torch

    mod = torch.jit.load(path, map_location="cpu")
    mod.eval()

    class _TorchPolicy(NumpyPolicy):
        def __init__(self, m):
            self.m = m
            self.weights = []

        def __call__(self, obs):
            with torch.no_grad():
                return (
                    self.m(torch.from_numpy(np.asarray(obs, np.float32)))
                    .numpy()
                )

    return _TorchPolicy(mod)
