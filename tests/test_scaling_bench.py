"""Scaling harness regression (VERDICT round 2, next-round item 6).

Real multi-host numbers are hardware-gated (one chip on this box), but the
measurement harness itself must stay runnable and produce sane efficiency
numbers on the emulated CPU mesh — this is what keeps the published
docs/PERFORMANCE.md scaling table reproducible.

Weak scaling 1 -> 2 emulated devices on tiny shapes. The floor is
deliberately loose (0.35): CPU emulation timeslices both "devices" onto
shared cores, so absolute efficiency is noisy — the test asserts the
harness runs end-to-end, shards correctly, and is not pathologically
serialized, not that ICI is fast.
"""

import pytest


@pytest.mark.slow
def test_weak_scaling_harness_produces_sane_efficiency():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the emulated multi-device mesh (conftest sets 8)")

    from scripts.scaling_bench import measure

    fps1 = measure(1, envs_per_device=8, iters=2, T=4)
    fps2 = measure(2, envs_per_device=8, iters=2, T=4)
    assert fps1 > 0 and fps2 > 0
    eff = fps2 / (2 * fps1)
    # CPU-emulated: devices share cores, so 2-device weak scaling cannot
    # reach 1.0; it must still clear a floor that catches accidental
    # serialization (e.g. a global all-gather of env state would halve it)
    assert eff >= 0.35, f"weak-scaling efficiency {eff:.2f} below floor"
