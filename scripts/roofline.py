"""FLOPs / bytes / MFU accounting for the headline train iteration (CLI).

Answers "what fraction of the chip does N env steps/s actually use?"
(round-4 VERDICT item): counts the arithmetic the training iteration
performs — physics mega-kernel (from its jaxpr, loop trip counts
applied), rollout/learn network matmuls (analytic), GAE — and the major
HBM flows, then divides by the measured iteration time against the
chip's peaks.

The census itself lives in `humanoid_gym_tpu.utils.roofline` (round 5):
`bench.py` imports the same functions at bench time, so the CLI and the
bench MFU field agree by construction.

Usage:
  JAX_PLATFORMS=cpu python scripts/roofline.py [--iter-ms 226] \
      [--envs 4096] [--terrain]
With no --iter-ms, prints the census only (CPU-safe; nothing runs on
TPU).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from humanoid_gym_tpu.utils.platform import apply_platform_env

apply_platform_env()

from humanoid_gym_tpu.utils.roofline import (  # noqa: E402
    HBM_BW,
    MXU_BF16_PEAK,
    VPU_F32_PEAK,
    hbm_bytes,
    net_flops,
    physics_flops_per_step,
    physics_vregs_per_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--iter-ms", type=float, default=None,
                    help="measured train-iteration time (ms) for MFU")
    ap.add_argument("--terrain", action="store_true")
    a = ap.parse_args()

    T = 60
    phys = physics_flops_per_step(a.envs) * T
    roll_nn, learn_nn = net_flops(a.envs, T)
    gae = a.envs * T * 10  # reverse scan + normalization, ~10 FLOP/sample
    total = phys + roll_nn + learn_nn + gae
    flows = hbm_bytes(a.envs, T, a.terrain)
    bts = sum(flows.values())

    print(f"== FLOPs per train iteration ({a.envs} envs, T={T}) ==")
    print(f"  physics kernel (VPU)   {phys/1e9:10.2f} GFLOP")
    print(f"  rollout nets (MXU)     {roll_nn/1e9:10.2f} GFLOP")
    print(f"  learn nets (MXU)       {learn_nn/1e9:10.2f} GFLOP")
    print(f"  GAE/misc               {gae/1e9:10.2f} GFLOP")
    print(f"  TOTAL                  {total/1e9:10.2f} GFLOP")
    print(f"== major HBM flows ==")
    for k, v in flows.items():
        print(f"  {k:36s} {v/1e6:9.1f} MB")
    print(f"  TOTAL                                {bts/1e9:9.2f} GB")
    vr = physics_vregs_per_step(a.envs) * T
    print(f"== physics issue census ==")
    print(f"  vreg-ops per iteration  {vr/1e6:10.1f} M "
          f"(per tile-substep: {vr/(a.envs/128)/T/10:,.0f})")
    if a.iter_ms:
        t = a.iter_ms / 1e3
        steps = a.envs * T / t
        print(f"== utilization at {a.iter_ms:.0f} ms/iter "
              f"({steps/1e3:.0f}k env steps/s) ==")
        print(f"  MFU (vs {MXU_BF16_PEAK/1e12:.0f} TF/s bf16 MXU peak)"
              f"   {total / (t * MXU_BF16_PEAK) * 100:6.2f} %")
        print(f"  VPU util (physics vs {VPU_F32_PEAK/1e12:.1f} TF/s f32)"
              f"  {phys / (t * VPU_F32_PEAK) * 100:6.2f} %")
        print(f"  HBM util (vs {HBM_BW/1e9:.0f} GB/s)"
              f"              {bts / (t * HBM_BW) * 100:6.2f} %")
        print(f"  physics vreg issue rate  {vr/t/1e9:.2f} G vreg-ops/s "
              f"(~{vr/t/0.94e9:.2f} issued/cycle at 0.94 GHz — the kernel's")
        print("   runtime tracks THIS axis: issue slots, not FLOPs)")


if __name__ == "__main__":
    main()
