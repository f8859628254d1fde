"""Metric logging (SURVEY.md §5.5).

The reference's observability stack is wandb (scalars each step, images,
Object3D point clouds, weight/grad histograms —
reference train_SOccDPT.py:397-403, utils/__init__.py:618-765). Here the
default sink is console + JSONL (machine-readable, no service
dependency); wandb attaches automatically when importable, preserving
the reference behavior.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricWriter:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        use_wandb: bool = False,
        project: str = "soccdpt_tpu",
        run_id: Optional[str] = None,
        console: bool = True,
    ) -> None:
        self.console = console
        self.run_id = run_id or time.strftime("%Y%m%d_%H%M%S")
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(
                os.path.join(log_dir, f"metrics_{self.run_id}.jsonl"), "a"
            )
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, id=self.run_id, resume="allow")
            except Exception as e:  # wandb not installed / offline
                print(f"[logging] wandb unavailable ({e}); JSONL/console only")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(v)
            except (TypeError, ValueError):
                continue
        record = {"step": step, "time": time.time(), **scalars}
        if self.console:
            pretty = " ".join(
                f"{k}={v:.6g}" for k, v in scalars.items() if k != "time"
            )
            print(f"[step {step}] {pretty}")
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, image, step: Optional[int] = None) -> None:
        if self._wandb:
            self._wandb.log({name: self._wandb.Image(image)}, step=step)

    def log_points3d(
        self, name: str, points_colors, step: Optional[int] = None
    ) -> None:
        """(N, 6) [x, y, z, r, g, b] point cloud — wandb Object3D when
        available (reference utils/__init__.py:754-759), else a .npy
        artifact next to the JSONL log."""
        import numpy as np

        if self._wandb:
            self._wandb.log(
                {
                    name: self._wandb.Object3D(
                        {"type": "lidar/beta", "points": points_colors}
                    )
                },
                step=step,
            )
        elif self._jsonl:
            import os

            path = os.path.join(
                os.path.dirname(self._jsonl.name),
                f"{self.run_id}_{name.replace('/', '_')}_{step}.npy",
            )
            np.save(path, np.asarray(points_colors))

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:
            self._wandb.finish()


def param_histograms(params, grads=None) -> Dict[str, Any]:
    """Weight/grad summary stats per leaf (the reference logs full wandb
    histograms, utils/__init__.py:618-626; here: mean/std/absmax)."""
    import jax
    import numpy as np

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "Weights/" + jax.tree_util.keystr(path)
        a = np.asarray(leaf)
        out[name + ".std"] = float(a.std())
        out[name + ".absmax"] = float(np.abs(a).max())
    if grads is not None:
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            name = "Gradients/" + jax.tree_util.keystr(path)
            a = np.asarray(leaf)
            out[name + ".std"] = float(a.std())
            out[name + ".absmax"] = float(np.abs(a).max())
    return out
