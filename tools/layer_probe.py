"""Per-layer conv timing for the depth/pose nets at training shapes.

Times each conv of MD2-ResNet18 + decoder (and the pose stack's ResNet-18 at
its 216-image pair batch) with an in-jit fori_loop (so the ~28 ms tunnel
dispatch amortizes away) and prints time/flops/MFU per layer -- the measure
step for the round-3 depth-net MFU attack (VERDICT next-round item 1).

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
    ap.add_argument("--variants", action="store_true",
                    help="also time channel-padded / grouped variants")
    ap.add_argument("--bwd", action="store_true", help="time fwd+bwd instead of fwd")
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)

    def conv_time(B, H, W, Cin, Cout, k, stride, iters, bwd=False):
        """Seconds per conv fwd (or fwd+bwd) via an in-jit chained loop."""
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)).astype(np.float32)).astype(cdt)
        w = jnp.asarray(
            rng.standard_normal((k, k, Cin, Cout)).astype(np.float32) * 0.05
        ).astype(cdt)
        pad = k // 2

        def one(xi):
            return jax.lax.conv_general_dilated(
                xi, w, (stride, stride), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if bwd:
            def one_full(xi):
                y, vjp = jax.vjp(one, xi)
                (gx,) = vjp(y)
                return gx
            step = one_full
        else:
            step = one

        @jax.jit
        def run(x):
            def body(i, carry):
                # data-dependent perturbation defeats CSE/hoisting; cast to
                # the compute dtype so promotion doesn't change the conv
                pert = ((carry + i.astype(jnp.float32)) * 1e-12).astype(cdt)
                y = step(x + pert)
                return jnp.mean(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(run(x))  # compile
        t0 = time.perf_counter()
        out = float(run(x))
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(out)
        return dt

    def report(name, B, H, W, Cin, Cout, k, stride):
        t = conv_time(B, H, W, Cin, Cout, k, stride, args.iters, bwd=args.bwd)
        Ho, Wo = H // stride, W // stride
        flops = 2 * B * Ho * Wo * Cin * Cout * k * k * (3 if args.bwd else 1)
        mfu = flops / (t * PEAK)
        print(f"{name:28s} B{B:4d} {H:4d}x{W:4d} {Cin:4d}->{Cout:4d} k{k} s{stride}"
              f"  {t*1e3:7.3f} ms  {flops/1e9:7.1f} GF  MFU {100*mfu:5.1f}%")
        return t, flops

    B = 12
    print(f"== depth net convs (MD2-18 @ 192x640, B={B}, {args.dtype}, "
          f"{'fwd+bwd' if args.bwd else 'fwd'}) ==")
    total_t = total_f = 0.0
    specs = [
        ("stem 7x7s2", B, 192, 640, 3, 64, 7, 2),
        ("layer1 conv (x4)", B, 48, 160, 64, 64, 3, 1),
        ("layer2 conv1 s2", B, 48, 160, 64, 128, 3, 2),
        ("layer2 conv (x3)", B, 24, 80, 128, 128, 3, 1),
        ("layer3 conv1 s2", B, 24, 80, 128, 256, 3, 2),
        ("layer3 conv (x3)", B, 12, 40, 256, 256, 3, 1),
        ("layer4 conv1 s2", B, 12, 40, 256, 512, 3, 2),
        ("layer4 conv (x3)", B, 6, 20, 512, 512, 3, 1),
        ("dec upconv_4_0", B, 6, 20, 512, 256, 3, 1),
        ("dec upconv_4_1", B, 12, 40, 512, 256, 3, 1),
        ("dec upconv_3_0", B, 12, 40, 256, 128, 3, 1),
        ("dec upconv_3_1", B, 24, 80, 256, 128, 3, 1),
        ("dec upconv_2_0", B, 24, 80, 128, 64, 3, 1),
        ("dec upconv_2_1", B, 48, 160, 128, 64, 3, 1),
        ("dec upconv_1_0", B, 48, 160, 64, 32, 3, 1),
        ("dec upconv_1_1", B, 96, 320, 96, 32, 3, 1),
        ("dec upconv_0_0", B, 96, 320, 32, 16, 3, 1),
        ("dec upconv_0_1", B, 192, 640, 16, 16, 3, 1),
        ("dec dispconv_0", B, 192, 640, 16, 1, 3, 1),
    ]
    mult = {"layer1 conv (x4)": 4, "layer2 conv (x3)": 3, "layer3 conv (x3)": 3,
            "layer4 conv (x3)": 3}
    for spec in specs:
        t, f = report(*spec)
        m = mult.get(spec[0], 1)
        total_t += t * m
        total_f += f * m
    print(f"{'TOTAL (x-counted)':28s} {'':28s}  {total_t*1e3:7.1f} ms  "
          f"{total_f/1e9:7.1f} GF  MFU {100*total_f/(total_t*PEAK):5.1f}%")

    BP = 216
    print(f"\n== pose net convs (ResNet-18 @ 192x640, B*P={BP}) ==")
    total_t = total_f = 0.0
    pspecs = [
        ("pose stem 7x7s2", BP, 192, 640, 6, 64, 7, 2),
        ("pose layer1 conv (x4)", BP, 48, 160, 64, 64, 3, 1),
        ("pose layer2 conv1 s2", BP, 48, 160, 64, 128, 3, 2),
        ("pose layer2 conv (x3)", BP, 24, 80, 128, 128, 3, 1),
        ("pose layer3 conv1 s2", BP, 24, 80, 128, 256, 3, 2),
        ("pose layer3 conv (x3)", BP, 12, 40, 256, 256, 3, 1),
        ("pose layer4 conv1 s2", BP, 12, 40, 256, 512, 3, 2),
        ("pose layer4 conv (x3)", BP, 6, 20, 512, 512, 3, 1),
    ]
    pmult = {"pose layer1 conv (x4)": 4, "pose layer2 conv (x3)": 3,
             "pose layer3 conv (x3)": 3, "pose layer4 conv (x3)": 3}
    for spec in pspecs:
        t, f = report(*spec)
        m = pmult.get(spec[0], 1)
        total_t += t * m
        total_f += f * m
    print(f"{'TOTAL (x-counted)':28s} {'':28s}  {total_t*1e3:7.1f} ms  "
          f"{total_f/1e9:7.1f} GF  MFU {100*total_f/(total_t*PEAK):5.1f}%")

    if args.variants:
        print("\n== variants ==")
        # lane packing: same flops delivered with channels padded to 128
        report("l1 Cpad 64->128 in", B, 48, 160, 128, 64, 3, 1)
        report("l1 Cpad both 128", B, 48, 160, 128, 128, 3, 1)
        report("dec0_1 Cpad 128", B, 192, 640, 128, 128, 3, 1)
        # batch-for-spatial: layer1 rows as batch
        report("l1 as B=48 24x160", 48, 24, 160, 64, 64, 3, 1)
        # fatter image, fewer images
        report("l1 as B=1 x12 rows", 1, 48 * 12, 160, 64, 64, 3, 1)


if __name__ == "__main__":
    main()
