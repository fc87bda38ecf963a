"""Blend per-f_max-class step timings into an epoch-mix throughput.

The bucketed loader (--data.bucket_fs 2,5,7) runs each batch at its
class's compiled shape, so realistic-epoch throughput is the
mix-weighted harmonic blend of the class step times (imgs/s = B / t):

  python tools/mix_throughput.py --times 2=153,5=220,7=254 \
      --mix 2=0.35,5=0.20,7=0.45 --batch 12

Default mix: the late-epoch window distribution produced by the
curriculum's cutoff filter + 30% mini shrink measured over the eigen_zhou
baseline column (CLAUDE.md ledger). Times come from
`python bench.py --F <k>` (worst-case per class, so the blend is a
conservative lower bound: within a class most samples have f < F_c).
"""

from __future__ import annotations

import argparse
import json


def parse_kv(s: str) -> dict:
    out = {}
    for part in s.split(","):
        k, v = part.split("=")
        out[int(k)] = float(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", required=True,
                    help="per-class step ms, e.g. 2=153,5=220,7=254")
    ap.add_argument("--mix", default="2=0.35,5=0.20,7=0.45",
                    help="fraction of samples per class (sums to 1)")
    ap.add_argument("--batch", type=int, default=12)
    args = ap.parse_args()

    times = parse_kv(args.times)
    mix = parse_kv(args.mix)
    assert abs(sum(mix.values()) - 1.0) < 1e-6, "mix must sum to 1"
    assert set(mix) <= set(times), (sorted(mix), sorted(times))

    # each class processes its samples at B/t_c imgs/s; epoch wall time is
    # sum_c (N * mix_c) * t_c / B, so blended rate = 1 / sum(mix_c * t_c / B)
    sec_per_img = sum(mix[c] * (times[c] / 1e3) / args.batch for c in mix)
    blended = 1.0 / sec_per_img
    worst = args.batch / (max(times.values()) / 1e3)
    print(json.dumps({
        "blended_imgs_per_sec": round(blended, 1),
        "worst_case_imgs_per_sec": round(worst, 1),
        "speedup_vs_pad_to_max": round(blended / worst, 3),
        "mix": {str(k): v for k, v in mix.items()},
        "times_ms": {str(k): v for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()
