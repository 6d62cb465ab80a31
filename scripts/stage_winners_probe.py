"""Flagship step with the fused stage kernels restricted to the shapes the
hardware microbench (scripts/stage_shape_probe.py) showed WINNING:

  fwd: stem1, stem2, dec_fc, res1, ct4a      bwd: res3a

Everything else keeps the XLA composition. Monkeypatches the gates, then
reuses scripts/stage_fused_check.py's time_flagship.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import causalvae_tpu.ops.kernels.stage as ks

WIN_FWD = {
    (2, 15360, 512, 256),  # stem1: 103 vs 192 ms microbench
    (2, 15360, 256, 128),  # stem2: 31 vs 38
    (2, 960, 256, 512),    # dec_fc: 10 vs 16
    (3, 3840, 128, 128),   # res1: 10 vs 12
    (2, 15360, 128, 256),  # ct4a: 226 vs 397
}
WIN_BWD = {
    (3, 15360, 128, 128),  # res3a: 37 vs 60
}


def _key(x, kernel):
    return (kernel.shape[0], x.shape[1] * x.shape[2], x.shape[3],
            kernel.shape[-1])


ks.stage_ok = lambda x, k: (ks._stage_common_ok(x, k)
                            and _key(x, k) in WIN_FWD)
ks.stage_bwd_ok = lambda x, k: (ks._stage_common_ok(x, k)
                                and _key(x, k) in WIN_BWD)

import stage_fused_check as sfc  # noqa: E402

if __name__ == "__main__":
    print("winners-only gates active", file=sys.stderr)
    sfc.time_flagship()
