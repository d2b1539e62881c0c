"""Scaling harness regression gates (VERDICT round 3, next-round item 5).

Real multi-host numbers are hardware-gated (one chip on this box), but the
measurement harness must stay runnable and the sharded step must not regress
into serialization — these gates keep docs/scaling_emulated.json honest.

Two gates, both median-of-3 (single runs on a timesliced CPU host are too
noisy to be a gate; medians are stable — see the cv fields in the artifact):

1. Serialization control — the emulation's one clean signal: the SAME total
   env batch, sharded over many emulated devices vs unsharded on one, on
   identical host cores. Compute parallelism cancels out, so a ratio drop is
   sharding-induced serialization (e.g. an accidental global all-gather of
   env state, which replicates the full state per device and collapses the
   ratio). Measured 0.91 on this box (docs/scaling_emulated.json); the 0.75
   floor trips well before any per-device gather/scatter of global state.

2. Weak scaling 1 -> 2 devices, floor 0.70 (raised from the round-3 smoke
   value 0.35). Both points share every core, so 1.0 is unreachable in
   emulation; measured ~0.85-0.95. A serializing regression halves it.
"""

import statistics

import pytest


def _median(fn, k=3):
    return statistics.median(fn() for _ in range(k))


@pytest.mark.slow
def test_sharded_matches_unsharded_same_batch():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs the emulated multi-device mesh (conftest sets 8)")

    from scripts.scaling_bench import measure

    n = min(8, len(jax.devices()))
    total = 64
    unsharded = _median(lambda: measure(1, envs_per_device=total, iters=2, T=4))
    sharded = _median(lambda: measure(n, envs_per_device=total // n, iters=2, T=4))
    ratio = sharded / unsharded
    assert ratio >= 0.75, (
        f"sharded/unsharded throughput ratio {ratio:.2f} below floor — "
        f"the sharded step is serializing (collective or replication leak)"
    )


@pytest.mark.slow
def test_weak_scaling_harness_produces_sane_efficiency():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the emulated multi-device mesh (conftest sets 8)")

    from scripts.scaling_bench import measure

    fps1 = _median(lambda: measure(1, envs_per_device=8, iters=2, T=4))
    fps2 = _median(lambda: measure(2, envs_per_device=8, iters=2, T=4))
    assert fps1 > 0 and fps2 > 0
    eff = fps2 / (2 * fps1)
    assert eff >= 0.70, f"median weak-scaling efficiency {eff:.2f} below floor"
