"""pjit training loop for SOccDPT.

Rebuild of the reference's train loop (reference train_SOccDPT.py:109-449)
as a jitted, mesh-sharded train step:

* batch sharded over the ``data`` mesh axis, params replicated; XLA
  inserts the gradient all-reduce over ICI (SURVEY.md §2.5),
* patch-wise parameter-subset training via stop_gradient masks
  (train/patchwise.py) instead of requires_grad mutation,
* loss evaluated at GT resolution after the exact reference upsampling
  (bicubic align_corners=False for disparity, nearest for seg —
  reference SOccDPT.py:270-282),
* Adam(+weight decay) with a host-side reduce-on-plateau LR controller
  (reference train_SOccDPT.py:311-322), bf16 compute when ``amp``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig, TrainConfig
from ..models.soccdpt import build_model
from ..ops.resize import resize_nchw
from ..parallel import mesh as mesh_lib
from .losses import joint_loss
from .patchwise import (
    encoder_mask,
    patch_masks,
    select_trainable,
    zero_frozen_grads,
)

PyTree = Any


@chex.dataclass
class TrainState:
    step: jnp.ndarray
    params: PyTree
    batch_stats: PyTree
    opt_state: PyTree


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (mode=min, patience=2, factor=0.1),
    the reference's scheduler (train_SOccDPT.py:320-322)."""

    def __init__(self, base_lr: float, patience: int = 2, factor: float = 0.1):
        self.lr = base_lr
        self.patience = patience
        self.factor = factor
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters
    (train_SOccDPT.py:311-318); lr injected so the plateau controller can
    update it without rebuilding opt state."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=tcfg.learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=tcfg.weight_decay,
    )


def set_learning_rate(opt_state, lr: float):
    """Functional LR update on an InjectHyperparamsState."""
    return opt_state._replace(
        hyperparams={
            **opt_state.hyperparams,
            "learning_rate": jnp.asarray(lr, jnp.float32),
        }
    )


class Trainer:
    def __init__(
        self,
        mcfg: ModelConfig,
        tcfg: TrainConfig,
        mesh: Optional[Mesh] = None,
        use_pallas: Optional[bool] = None,
    ) -> None:
        if tcfg.amp and mcfg.compute_dtype != "bfloat16":
            mcfg = dataclasses.replace(mcfg, compute_dtype="bfloat16")
        # use_pallas is trainable since the window-attention kernel
        # gained a custom VJP (Pallas forward, XLA-recompute backward —
        # ops/window_attention.pallas_window_attention)
        self.mcfg = mcfg
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.model = build_model(
            mcfg, use_pallas=use_pallas, remat=tcfg.remat_backbone
        )
        self.tx = make_optimizer(tcfg)
        self.scheduler = PlateauScheduler(tcfg.learning_rate)
        self._step_cache: Dict[int, Callable] = {}
        self.trainable_mask: Optional[PyTree] = None
        self.masks: List[PyTree] = []

    # -- initialization ------------------------------------------------

    def init_state(self, rng: jax.Array, sample_image: np.ndarray) -> TrainState:
        variables = self.model.init(
            rng, jnp.asarray(sample_image), deterministic=True, return_raw=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        # Encoder freeze + patchwise partition (reference
        # train_SOccDPT.py:262-263, 362-364).
        self.trainable_mask = encoder_mask(params, self.tcfg.encoder_percentage)
        self.masks = patch_masks(
            self.trainable_mask, self.tcfg.patchwise_percentage
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return jax.device_put(
            state, NamedSharding(self.mesh, P())
        )

    # -- train step ----------------------------------------------------

    def _build_step(self, patch_index: int, donate: bool = True) -> Callable:
        mask = self.masks[patch_index]
        model = self.model
        tx = self.tx
        tcfg = self.tcfg

        def loss_fn(params, batch_stats, batch, rng):
            p = select_trainable(params, mask)
            (inv_depth, seg), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["image"],
                deterministic=False,
                return_raw=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            gt_hw = batch["disparity"].shape[-2:]
            disp_pred = resize_nchw(
                inv_depth.astype(jnp.float32), gt_hw, "bicubic", False
            )
            seg_pred = resize_nchw(seg.astype(jnp.float32), gt_hw, "nearest")
            total, aux = joint_loss(
                disp_pred,
                batch["disparity"].astype(jnp.float32),
                batch["mask_disp"].astype(jnp.float32),
                seg_pred,
                batch["seg"].astype(jnp.float32),
                batch["mask_seg"].astype(jnp.float32),
                loss_weights=tcfg.loss_weights,
                compute_scale_and_shift=tcfg.compute_scale_and_shift,
            )
            return total, (aux, updates.get("batch_stats", batch_stats))

        @partial(jax.jit, donate_argnums=(0,) if donate else ())
        def train_step(state: TrainState, batch, rng):
            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, rng)
            grads = zero_frozen_grads(grads, mask)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            # adamw's decoupled weight decay would otherwise shrink frozen
            # params even with zero grads — freeze means freeze.
            updates = zero_frozen_grads(updates, mask)
            new_params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, **aux}
            return (
                TrainState(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                ),
                metrics,
            )

        return train_step

    def train_step(
        self, state: TrainState, batch: Dict[str, np.ndarray], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One optimizer step per patch mask over the same batch.

        ``patchwise_mode="inplace"`` (default): sequential patch steps,
        each seeing the previous patch's updates — the reference's
        PatchWiseInplace inner loop (train_SOccDPT.py:362-393).
        ``"snapshot"``: every patch trained from the same start params,
        updates batch-applied at the end — the reference's non-inplace
        PatchWise (patchwise_training/__init__.py:9-145); optimizer
        state and BN statistics still thread sequentially, exactly like
        the reference's shared optimizer across the patch loop.
        """
        device_batch = self._shard_batch(batch)
        snapshot = (
            self.tcfg.patchwise_mode == "snapshot" and len(self.masks) > 1
        )
        metrics = {}
        if not snapshot:
            for i in range(len(self.masks)):
                if i not in self._step_cache:
                    self._step_cache[i] = self._build_step(i)
                rng, sub = jax.random.split(rng)
                state, metrics = self._step_cache[i](state, device_batch, sub)
            return state, metrics

        w0 = state.params  # shared start for every patch
        merged = w0
        for i, mask in enumerate(self.masks):
            key = ("snap", i)
            if key not in self._step_cache:
                # no donation: w0 is reused by every patch
                self._step_cache[key] = self._build_step(i, donate=False)
            rng, sub = jax.random.split(rng)
            s_i = TrainState(
                step=state.step,
                params=w0,
                batch_stats=state.batch_stats,
                opt_state=state.opt_state,
            )
            s_i, metrics = self._step_cache[key](s_i, device_batch, sub)
            # keep only this patch's updated leaves
            merged = jax.tree_util.tree_map(
                lambda flag, new, cur: new if flag else cur,
                mask,
                s_i.params,
                merged,
            )
            state = TrainState(
                step=s_i.step,
                params=w0,
                batch_stats=s_i.batch_stats,
                opt_state=s_i.opt_state,
            )
        return (
            TrainState(
                step=state.step,
                params=merged,
                batch_stats=state.batch_stats,
                opt_state=state.opt_state,
            ),
            metrics,
        )

    def shard_batch(self, batch: Dict[str, np.ndarray]):
        """Host->device transfer with minimal bytes: boolean masks ship
        as uint8 (4x less wire traffic than float32 — the GT tensors at
        camera resolution dominate step time on tunneled devices) and
        are cast on device inside the jitted loss. With
        ``tcfg.gt_downscale = k > 1`` the GT tensors are subsampled k-fold
        per axis on the host before transfer (k^2 fewer wire bytes; the
        SSI loss is scale-and-shift invariant and the masked BCE is a
        mean, so the loss statistics are preserved on subsampled pixels —
        verified in tests/test_training.py). Batches already on device
        (e.g. via data.loader.device_prefetch) pass through untouched."""
        out = {}
        sh = mesh_lib.batch_sharding(self.mesh)
        ds = max(int(self.tcfg.gt_downscale), 1)
        for k in ("image", "disparity", "mask_disp", "seg", "mask_seg"):
            if k in batch:
                arr = batch[k]
                if isinstance(arr, jax.Array):
                    out[k] = arr
                    continue
                arr = np.asarray(arr)
                if ds > 1 and k != "image":
                    arr = arr[..., ::ds, ::ds]
                if arr.dtype == bool:
                    arr = arr.astype(np.uint8)
                elif k in ("seg", "mask_disp", "mask_seg") and np.all(
                    (arr == 0) | (arr == 1)
                ):
                    arr = arr.astype(np.uint8)
                out[k] = jax.device_put(arr, sh)
        return out

    # kept as an alias for older callers
    _shard_batch = shard_batch

    # -- LR control ----------------------------------------------------

    def on_plateau_metric(self, state: TrainState, metric: float) -> TrainState:
        new_lr = self.scheduler.step(metric)
        return dataclasses.replace(
            state, opt_state=set_learning_rate(state.opt_state, new_lr)
        )
