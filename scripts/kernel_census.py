"""Jaxpr equation census of the mega kernel (perf tooling).

The kernel is issue-bound (docs/PERFORMANCE.md): per-substep equation
count is the proxy that tracked every landed optimization. Traces ONE
substep in interpret mode on CPU and prints totals + a per-source-line
histogram so stacking work can be measured without touching the TPU.

Usage: JAX_PLATFORMS=cpu python scripts/kernel_census.py [--terrain] [--lines N]
"""
import argparse
import os
import sys
from collections import Counter
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from humanoid_gym_tpu.utils.platform import apply_platform_env

apply_platform_env()


def census(terrain=False, lines=30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humanoid_gym_tpu.physics import mega_kernel as mk
    from humanoid_gym_tpu.physics.model import build_xbot_model

    m = build_xbot_model()
    KP = jnp.asarray(
        [200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32
    )
    sm = mk._StaticModel(m, KP, jnp.full(12, 10.0), np.asarray(m.dof_effort) * 0.85)
    packed = jnp.zeros((128, mk.IN_ROWS))
    tmap = None
    packed2 = None
    f = partial(
        mk._mega_call, sm=sm, dt=0.001, decimation=1, iterations=8,
        contact_offset=0.01, max_depen_vel=1.0, interpret=True, terrain=tmap,
    )
    jaxpr = jax.make_jaxpr(lambda p: f(p, packed2))(packed)

    prim_hist, line_hist = Counter(), Counter()

    def src_line(eq):
        tb = eq.source_info.traceback
        if tb is not None:
            # innermost frames are the algebra helpers (_mul/_add); the
            # kernel-body call site is the outermost mega_kernel frame
            best = None
            for f_ in tb.frames:
                base = os.path.basename(f_.file_name)
                # kernel-body call sites (not the algebra helpers below
                # line 340, not the pallas_call wrapper above 980)
                if base == "mega_kernel.py" and 340 < f_.line_num < 980:
                    best = f"{base}:{f_.line_num}"
                elif base == "pallas_solver.py" and best is None:
                    best = f"{base}:{f_.line_num}"
        if tb is not None and best:
            return best
        return "?"

    def walk(jx):
        n = 0
        for eq in jx.eqns:
            sub = []
            for p in eq.params.values():
                if hasattr(p, "jaxpr") or hasattr(p, "eqns"):
                    sub.append(p)
                elif isinstance(p, (list, tuple)):
                    sub += [q for q in p if hasattr(q, "jaxpr") or hasattr(q, "eqns")]
            if sub:
                for q in sub:
                    jx2 = q if hasattr(q, "eqns") else q.jaxpr
                    jx2 = jx2 if hasattr(jx2, "eqns") else jx2.jaxpr
                    n += walk(jx2)
            else:
                prim_hist[eq.primitive.name] += 1
                line_hist[src_line(eq)] += 1
                n += 1
        return n

    total = walk(jaxpr.jaxpr)
    print(f"leaf eqns per substep: {total}")
    print("\ntop primitives:")
    for k, v in prim_hist.most_common(12):
        print(f"  {k:24s} {v}")
    print("\ntop source lines:")
    for k, v in line_hist.most_common(lines):
        print(f"  {k:32s} {v}")
    return total


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--terrain", action="store_true")
    p.add_argument("--lines", type=int, default=30)
    a = p.parse_args()
    census(terrain=a.terrain, lines=a.lines)
