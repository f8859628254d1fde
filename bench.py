"""Benchmark: SOccDPT V3 dpt_swin2_tiny_256 inference rate on one chip.

Protocol mirrors the reference's FPS measurement (50 sequential
forwards, wall clock — reference eval_SOccDPT.py:247-259 /
eval_timing.py:6-29) with ``block_until_ready`` in place of CUDA events.
Baseline: 47 Hz (reference README.md:7). Prints ONE JSON line.
"""
from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from soccdpt_tpu.core.config import ModelConfig
    from soccdpt_tpu.models.soccdpt import build_model

    from __graft_entry__ import _fake_init

    batch = 8  # batched serving; per-image rate reported
    cfg = ModelConfig(
        model_type="dpt_swin2_tiny_256", version=3, compute_dtype="bfloat16"
    )
    model = build_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 3, 256, 256)),
        jnp.float32,
    )
    variables = _fake_init(model, x[:1], deterministic=True, return_raw=True)

    @jax.jit
    def forward(inp):
        return model.apply(inp_vars, inp, deterministic=True, return_raw=True)

    inp_vars = variables
    # warmup / compile
    out = forward(x)
    jax.block_until_ready(out)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    hz = iters * batch / dt
    baseline = 47.0
    print(
        json.dumps(
            {
                "metric": "inference_hz_per_chip_swin2_tiny_256",
                "value": round(hz, 2),
                "unit": "frames/s",
                "vs_baseline": round(hz / baseline, 2),
                "batch": batch,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
