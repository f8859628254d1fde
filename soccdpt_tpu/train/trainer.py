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
from .losses import masked_bce_loss, ssi_loss_from_net
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
        self.mesh = mesh if mesh is not None else self._default_mesh(tcfg)
        self.model = build_model(
            mcfg, use_pallas=use_pallas, remat=tcfg.remat_backbone
        )
        self.tx = make_optimizer(tcfg)
        self.scheduler = PlateauScheduler(tcfg.learning_rate)
        self._step_cache: Dict[int, Callable] = {}
        self.trainable_mask: Optional[PyTree] = None
        self.masks: List[PyTree] = []

    # -- initialization ------------------------------------------------

    @staticmethod
    def _default_mesh(tcfg: TrainConfig) -> Mesh:
        """(data, model) mesh from ``tcfg.tp``; pure data-parallel 1-D
        mesh when tp == 1."""
        tp = max(int(tcfg.tp), 1)
        if tp == 1:
            return mesh_lib.mesh_for_batch(tcfg.batch_size)
        devices = jax.devices()
        if len(devices) % tp != 0:
            raise ValueError(
                f"tp={tp} does not divide device count {len(devices)}"
            )
        dp = len(devices) // tp
        # the data axis must divide the global batch
        while dp > 1 and tcfg.batch_size % dp != 0:
            dp -= 1
        return mesh_lib.make_mesh(
            shape=(dp, tp),
            axes=(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS),
            devices=devices[: dp * tp],
        )

    def param_shardings(self, params: PyTree) -> PyTree:
        """NamedSharding tree for params on this trainer's mesh: weight
        matrices sharded over the ``model`` axis when it exists
        (parallel/sharding.py), everything replicated otherwise."""
        from ..parallel.sharding import param_sharding_rules

        return param_sharding_rules(
            params, self.mesh, min_size=self.tcfg.tp_min_size
        )

    def reshard_state(self, state: TrainState) -> TrainState:
        """Place an arbitrarily-placed state (fresh init, checkpoint
        restored from another mesh topology, torch import) onto THIS
        trainer's mesh: params per the tp rules, Adam moments matched to
        their params' shardings, batch_stats and step replicated. This
        is what makes cross-topology restore (8x1 ckpt -> 4x2 mesh and
        vice versa) a product feature."""
        rules = self.param_shardings(state.params)
        params = jax.tree_util.tree_map(jax.device_put, state.params, rules)
        repl = NamedSharding(self.mesh, P())

        # Moment trees (mu/nu) embed the params dict structure, so a
        # moment leaf's path SUFFIX equals its param's path; scalars
        # (count, hyperparams) match nothing and replicate.
        param_shapes = {
            path: np.shape(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(state.params)
        }
        rule_by_path = {
            path: s
            for path, s in jax.tree_util.tree_leaves_with_path(rules)
        }

        def place_opt_leaf(path, leaf):
            for i in range(len(path)):
                suffix = tuple(path[i:])
                s = rule_by_path.get(suffix)
                if s is not None and param_shapes.get(suffix) == np.shape(leaf):
                    return jax.device_put(leaf, s)
            return jax.device_put(leaf, repl)

        opt_state = jax.tree_util.tree_map_with_path(
            place_opt_leaf, state.opt_state
        )
        return TrainState(
            step=jax.device_put(state.step, repl),
            params=params,
            batch_stats=jax.device_put(state.batch_stats, repl),
            opt_state=opt_state,
        )

    def init_state(self, rng: jax.Array, sample_image: np.ndarray) -> TrainState:
        variables = self.model.init(
            rng, jnp.asarray(sample_image), deterministic=True, return_raw=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # Tensor-parallel placement is part of the product path (not a
        # dryrun-only hand-wire): params go onto the mesh per the tp
        # rules BEFORE the optimizer init.
        params = jax.tree_util.tree_map(
            jax.device_put, params, self.param_shardings(params)
        )
        opt_state = jax.jit(self.tx.init)(params)
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
        # reshard_state places the Adam moments by param-path suffix.
        # Relying on jit's output shardings does NOT work: zeros_like
        # has no data dependence on its input, so SPMD propagation has
        # nothing to carry the param sharding through and the moments
        # come out replicated — found by
        # tests/test_multichip_flagship.py at flagship scale (tp>1 lost
        # 2/3 of the optimizer-memory saving, silently).
        return self.reshard_state(state)

    # -- train step ----------------------------------------------------

    def build_step_fn(self, patch_index: int) -> Callable:
        """The PURE train-step function (state, batch, rng) -> (state,
        metrics) for one patch mask — un-jitted, so callers can compose
        it (chained device-roofline timing in scripts/train_roofline.py,
        custom jits). ``_build_step`` wraps it in jit for the train loop."""
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
            # Reference semantics: upsample to camera resolution, then
            # SSI + BCE (SOccDPT.py:270-282, train_SOccDPT.py:379-388).
            # The disparity resize is folded into the loss so each SSI
            # pyramid level is an MXU matmul from the net output instead
            # of a gather/scatter pair at 1080p (see losses.py).
            l_disp = ssi_loss_from_net(
                inv_depth.astype(jnp.float32),
                batch["disparity"].astype(jnp.float32),
                batch["mask_disp"].astype(jnp.float32),
                do_compute_scale_and_shift=tcfg.compute_scale_and_shift,
            )
            seg_pred = resize_nchw(seg.astype(jnp.float32), gt_hw, "nearest")
            l_seg = masked_bce_loss(
                seg_pred,
                batch["seg"].astype(jnp.float32),
                batch["mask_seg"].astype(jnp.float32),
            )
            w_depth, w_seg = tcfg.loss_weights
            total = w_depth * l_disp + w_seg * l_seg
            aux = {"loss_disp": l_disp, "loss_seg": l_seg}
            return total, (aux, updates.get("batch_stats", batch_stats))

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

    def _build_step(self, patch_index: int, donate: bool = True) -> Callable:
        return jax.jit(
            self.build_step_fn(patch_index),
            donate_argnums=(0,) if donate else (),
        )

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
