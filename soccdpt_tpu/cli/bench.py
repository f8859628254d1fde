"""Benchmark: SOccDPT V3 dpt_swin2_tiny_256 inference rate on one chip.

Protocol: the reference measures 50 sequential forwards of ``net(x)`` by
wall clock (reference eval_SOccDPT.py:247-259), where the forward is the
FULL contract — net-resolution heads, bicubic/nearest upsample to camera
resolution (1920x1080), depth inversion, and point-cloud unprojection,
with ``compute_occ=False`` (reference SOccDPT.py:152,366-372). The
headline metric here times exactly that contract (``return_raw=False``);
the raw net-resolution pair (``return_raw=True``) is reported as a
secondary field.

Through the axon TPU tunnel, per-dispatch host latency (~40 ms RTT)
would swamp the ~1 ms device time and ``block_until_ready`` does not
synchronize, so the N forwards are chained *inside one jit* via
``lax.fori_loop`` with a data dependency between iterations; device time
per forward is ``(t_chain(N) - t_chain(1)) / (N - 1)`` on warm
executables. A persistent compilation cache keeps recompiles out of the
measurement.

Baseline: 47 Hz (reference README.md:7). Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial

CACHE_DIR = os.environ.get(
    "SOCCDPT_JAX_CACHE",
    os.path.join(os.getcwd(), ".jax_cache"),
)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from soccdpt_tpu.core.config import ModelConfig
    from soccdpt_tpu.models.soccdpt import build_model

    from ..utils.fake_init import structural_init as _fake_init

    # Per-image rate is ~0.9-1.0 ms across batch sizes (PERF.md); batch 1
    # is the honest comparison to the reference's sequential 47 Hz protocol.
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    # Chain enough forwards that device time dominates the tunnel's
    # per-dispatch RTT jitter in the t(N) - t(1) difference.
    n_iters = int(os.environ.get("BENCH_ITERS", "201"))
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"

    cfg = ModelConfig(
        model_type="dpt_swin2_tiny_256", version=3, compute_dtype="bfloat16"
    )
    model = build_model(cfg, use_pallas=use_pallas)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 3, 256, 256)),
        jnp.float32,
    )
    variables = jax.device_put(
        _fake_init(model, x[:1], deterministic=True, return_raw=True)
    )

    # Two weight-binding modes. Default: weights BAKED into the program
    # as constants — the serving-artifact deployment mode (the reference
    # bakes weights into its ONNX export the same way); XLA constant-
    # folds weight layouts, measured worth ~5% per forward (PERF.md:
    # 833 Hz baked vs 790-798 Hz argument mode). BENCH_WEIGHT_ARGS=1
    # passes the tree as a jit argument instead (the only mode that
    # compiles for 200M+ param models through the remote-compile
    # transport — see utils/timing.py).
    weight_args = os.environ.get("BENCH_WEIGHT_ARGS", "0") == "1"

    @partial(jax.jit, static_argnums=(2, 3))
    def chained(v, inp, n, full):
        if v is None:
            v = variables
        def body(i, carry):
            if full:
                # Full reference contract: (inv_depth, seg, points, None)
                # at camera resolution, compute_occ=False — what the
                # reference's 47 Hz times (eval_SOccDPT.py:247-259 ->
                # SOccDPT.py:681-685 -> get_semantic_occupancy :264-372).
                inv_d, seg, points, _ = model.apply(
                    v, carry, deterministic=True,
                    return_raw=False, compute_occ=False,
                )
                dep = (
                    inv_d.mean()
                    + seg.mean().astype(inv_d.dtype)
                    + points.mean().astype(inv_d.dtype)
                )
            else:
                inv_d, seg = model.apply(
                    v, carry, deterministic=True, return_raw=True
                )
                # data dependency on BOTH outputs: without it XLA
                # dead-code eliminates the untouched head and the bench lies
                dep = inv_d.mean() + seg.mean().astype(inv_d.dtype)
            return carry + (dep * 1e-9)[None, None, None, None].astype(
                carry.dtype
            )

        return jax.lax.fori_loop(0, n, body, inp).sum()

    def measure(full):
        def timed(n):
            t0 = time.perf_counter()
            # value fetch = real synchronization
            float(chained(variables if weight_args else None, x, n, full))
            return time.perf_counter() - t0

        timed(1)  # compile n=1
        timed(n_iters)  # compile n=N
        t1 = min(timed(1) for _ in range(3))
        # Repeat-run spread: each tn repeat yields its own per-forward
        # estimate; the min is the headline (least tunnel noise), the
        # stddev makes ±few-Hz moves between rounds interpretable
        # (VERDICT r4 #3: "823 vs 829 is uninterpretable without bars").
        reps = 5
        ests = [
            (timed(n_iters) - t1) / (n_iters - 1) for _ in range(reps)
        ]
        best = min(ests)
        std = float(np.std(ests, ddof=1))
        return best, std

    per_forward_full, std_full = measure(full=True)
    per_forward_raw, _ = measure(full=False)

    hz = batch / per_forward_full
    # error propagation: d(hz) = hz^2/batch * d(t)
    hz_std = hz * hz / batch * std_full
    baseline = 47.0
    print(
        json.dumps(
            {
                "metric": "inference_hz_per_chip_swin2_tiny_256_full_contract",
                "value": round(hz, 1),
                "unit": "frames/s",
                "vs_baseline": round(hz / baseline, 2),
                "batch": batch,
                "hz_std": round(hz_std, 1),
                "ms_per_forward": round(per_forward_full * 1e3, 3),
                "ms_std": round(std_full * 1e3, 4),
                "raw_net_hz": round(batch / per_forward_raw, 1),
                "raw_net_ms": round(per_forward_raw * 1e3, 3),
                "pallas": use_pallas,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
