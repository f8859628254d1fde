"""Run a StableHLO export (reference scripts/run_SOccDPT_onnx.py).

Deserializes the exported artifact, runs it on one sample (or random
input), saves a visualization, and measures FPS — mirroring the
reference's onnxruntime flow (InferenceSession + 100-iter timing,
run_SOccDPT_onnx.py:32-176) without an ONNX dependency.
"""
from __future__ import annotations

import argparse
import time


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jax_export

    parser = argparse.ArgumentParser(description="Run exported SOccDPT")
    parser.add_argument("-m", "--model", default="exports/soccdpt.stablehlo")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--vis", default=None, help="save visualization PNG")
    args = parser.parse_args(argv)

    with open(args.model, "rb") as fh:
        exported = jax_export.deserialize(fh.read())
    fn = exported.call

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, 3, args.size, args.size)
        ),
        jnp.float32,
    )
    inv_d, seg = fn(x)
    print("outputs:", inv_d.shape, seg.shape)

    if args.vis:
        from ..data.bdd import class_2_color
        from ..utils import visualize

        panel = visualize.side_by_side(
            visualize.colorize_disparity(np.asarray(inv_d[0], np.float32)),
            visualize.color_segmentation(
                np.asarray(seg[0], np.float32), class_2_color
            ),
        )
        visualize.save_image(args.vis, panel)
        print("saved", args.vis)

    # FPS over the exported artifact
    jitted = jax.jit(fn)
    jitted(x)[0].block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = jitted(x)
    float(jnp.sum(out[0]))  # force completion
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.batch / dt:.1f} Hz ({dt * 1e3:.2f} ms/forward)")


if __name__ == "__main__":
    main()
