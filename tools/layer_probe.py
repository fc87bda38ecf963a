"""Per-layer conv timing for the depth/pose nets at training shapes.

Methodology: the naive jit-loop-per-conv measurement is dominated by a
~1 ms per-loop-iteration overhead on this platform (tools/floor_probe.py:
chained k=1..8 same-shape convs give t(k) ~= 0.97 ms + 0.11 ms * k), so each
shape is timed as the MARGINAL cost between a k=2-conv and k=8-conv loop
body (independent weights per conv so nothing CSEs away). This isolates the
true per-op cost the compiled net pays when ops run back-to-back.

  python tools/layer_probe.py [--iters 30] [--dtype bfloat16] [--variants]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variants", action="store_true")
    ap.add_argument("--k_lo", type=int, default=2)
    ap.add_argument("--k_hi", type=int, default=8)
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)

    def loop_time(B, H, W, Cin, Cout, k, stride, nconv):
        """Time of a fori_loop whose body runs `nconv` independent convs."""
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)).astype(np.float32)).astype(cdt)
        ws = [
            jnp.asarray(rng.standard_normal((k, k, Cin, Cout)).astype(np.float32) * 0.05).astype(cdt)
            for _ in range(nconv)
        ]
        pad = k // 2

        @jax.jit
        def run(x, ws):
            def body(i, carry):
                pert = ((carry + i.astype(jnp.float32)) * 1e-12).astype(cdt)
                acc = jnp.float32(0)
                for w in ws:
                    y = jax.lax.conv_general_dilated(
                        x + pert, w, (stride, stride), ((pad, pad), (pad, pad)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    acc = acc + jnp.mean(y.astype(jnp.float32))
                return acc
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        float(run(x, ws))  # compile
        t0 = time.perf_counter()
        out = float(run(x, ws))
        assert np.isfinite(out)
        return (time.perf_counter() - t0) / args.iters

    def report(name, B, H, W, Cin, Cout, k, stride):
        t_lo = loop_time(B, H, W, Cin, Cout, k, stride, args.k_lo)
        t_hi = loop_time(B, H, W, Cin, Cout, k, stride, args.k_hi)
        t = (t_hi - t_lo) / (args.k_hi - args.k_lo)
        Ho, Wo = H // stride, W // stride
        flops = 2 * B * Ho * Wo * Cin * Cout * k * k
        mfu = flops / (t * PEAK) if t > 0 else float("nan")
        print(f"{name:26s} B{B:4d} {H:4d}x{W:4d} {Cin:4d}->{Cout:4d} k{k} s{stride}"
              f"  {t*1e3:7.3f} ms  {flops/1e9:7.1f} GF  MFU {100*mfu:5.1f}%")
        return t, flops

    B = 12
    print(f"== depth net convs, marginal cost (MD2-18 @ 192x640, B={B}, {args.dtype}) ==")
    total_t = total_f = 0.0
    specs = [
        ("stem 7x7s2", B, 192, 640, 3, 64, 7, 2, 1),
        ("layer1 conv", B, 48, 160, 64, 64, 3, 1, 4),
        ("layer2 conv1 s2", B, 48, 160, 64, 128, 3, 2, 1),
        ("layer2 conv", B, 24, 80, 128, 128, 3, 1, 3),
        ("layer3 conv1 s2", B, 24, 80, 128, 256, 3, 2, 1),
        ("layer3 conv", B, 12, 40, 256, 256, 3, 1, 3),
        ("layer4 conv1 s2", B, 12, 40, 256, 512, 3, 2, 1),
        ("layer4 conv", B, 6, 20, 512, 512, 3, 1, 3),
        ("dec upconv_4_0", B, 6, 20, 512, 256, 3, 1, 1),
        ("dec upconv_4_1", B, 12, 40, 512, 256, 3, 1, 1),
        ("dec upconv_3_0", B, 12, 40, 256, 128, 3, 1, 1),
        ("dec upconv_3_1", B, 24, 80, 256, 128, 3, 1, 1),
        ("dec upconv_2_0", B, 24, 80, 128, 64, 3, 1, 1),
        ("dec upconv_2_1", B, 48, 160, 128, 64, 3, 1, 1),
        ("dec upconv_1_0", B, 48, 160, 64, 32, 3, 1, 1),
        ("dec upconv_1_1", B, 96, 320, 96, 32, 3, 1, 1),
        ("dec upconv_0_0", B, 96, 320, 32, 16, 3, 1, 1),
        ("dec upconv_0_1", B, 192, 640, 16, 16, 3, 1, 1),
        ("dec dispconv_0", B, 192, 640, 16, 1, 3, 1, 1),
    ]
    for name, b, h, w, ci, co, kk, s, mult in specs:
        t, f = report(name + (f" (x{mult})" if mult > 1 else ""), b, h, w, ci, co, kk, s)
        total_t += t * mult
        total_f += f * mult
    print(f"{'TOTAL fwd convs':26s} {'':30s}  {total_t*1e3:7.1f} ms  "
          f"{total_f/1e9:7.1f} GF  MFU {100*total_f/max(total_t,1e-9)/PEAK:5.1f}%")

    BP = 216
    print(f"\n== pose net convs, marginal cost (ResNet-18, B*P={BP}) ==")
    total_t = total_f = 0.0
    pspecs = [
        ("pose stem 7x7s2", BP, 192, 640, 6, 64, 7, 2, 1),
        ("pose layer1 conv", BP, 48, 160, 64, 64, 3, 1, 4),
        ("pose layer2 conv1 s2", BP, 48, 160, 64, 128, 3, 2, 1),
        ("pose layer2 conv", BP, 24, 80, 128, 128, 3, 1, 3),
        ("pose layer3 conv1 s2", BP, 24, 80, 128, 256, 3, 2, 1),
        ("pose layer3 conv", BP, 12, 40, 256, 256, 3, 1, 3),
        ("pose layer4 conv1 s2", BP, 12, 40, 256, 512, 3, 2, 1),
        ("pose layer4 conv", BP, 6, 20, 512, 512, 3, 1, 3),
    ]
    for name, b, h, w, ci, co, kk, s, mult in pspecs:
        t, f = report(name + (f" (x{mult})" if mult > 1 else ""), b, h, w, ci, co, kk, s)
        total_t += t * mult
        total_f += f * mult
    print(f"{'TOTAL fwd convs':26s} {'':30s}  {total_t*1e3:7.1f} ms  "
          f"{total_f/1e9:7.1f} GF  MFU {100*total_f/max(total_t,1e-9)/PEAK:5.1f}%")

    if args.variants:
        print("\n== variants (marginal) ==")
        report("l1 Cpad both 128", B, 48, 160, 128, 128, 3, 1)
        report("dec0_1 Cpad 128", B, 192, 640, 128, 128, 3, 1)
        report("dec0_1 spatial B=3x", 36, 192, 640, 16, 16, 3, 1)
        report("stem fp-like 1img", 1, 192, 640, 3, 64, 7, 2)


if __name__ == "__main__":
    main()
