"""Loss/metric tests against an independent torch oracle.

The oracle re-derives the published MiDaS scale-shift-invariant loss
(closed-form 2x2 solve + masked MSE + multi-scale gradient term) in
torch, to cross-check the jnp implementation.
"""
import numpy as np
import torch

from soccdpt_tpu.train.losses import (
    compute_scale_and_shift,
    joint_loss,
    masked_bce_loss,
    scale_and_shift_invariant_loss,
)
from soccdpt_tpu.train.metrics import (
    compute_masked_errors,
    seg_iou,
    ssi_aligned_depth_metrics,
)


def torch_ssi_loss(pred, tgt, mask, alpha=0.5, scales=4):
    pred, tgt, mask = map(torch.as_tensor, (pred, tgt, mask.astype(np.float32)))
    a00 = (mask * pred * pred).sum((1, 2))
    a01 = (mask * pred).sum((1, 2))
    a11 = mask.sum((1, 2))
    b0 = (mask * pred * tgt).sum((1, 2))
    b1 = (mask * tgt).sum((1, 2))
    det = a00 * a11 - a01 * a01
    s = torch.where(det != 0, (a11 * b0 - a01 * b1) / det, torch.zeros_like(det))
    t = torch.where(det != 0, (-a01 * b0 + a00 * b1) / det, torch.zeros_like(det))
    p = s.view(-1, 1, 1) * pred + t.view(-1, 1, 1)

    def mse(p, g, m):
        M = m.sum((1, 2))
        il = (m * (p - g) ** 2).sum((1, 2))
        return il.sum() / (2 * M).sum()

    def grad(p, g, m):
        M = m.sum((1, 2))
        d = m * (p - g)
        gx = (m[:, :, 1:] * m[:, :, :-1]) * (d[:, :, 1:] - d[:, :, :-1]).abs()
        gy = (m[:, 1:, :] * m[:, :-1, :]) * (d[:, 1:, :] - d[:, :-1, :]).abs()
        return (gx.sum((1, 2)) + gy.sum((1, 2))).sum() / M.sum()

    total = mse(p, tgt, mask)
    for sc in range(scales):
        st = 2**sc
        total = total + alpha * grad(
            p[:, ::st, ::st], tgt[:, ::st, ::st], mask[:, ::st, ::st]
        )
    return float(total)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_scale_shift_closed_form():
    pred = _rand((2, 8, 8), 0)
    tgt = 2.5 * pred + 1.25
    mask = np.ones_like(pred)
    s, t = compute_scale_and_shift(pred, tgt, mask)
    np.testing.assert_allclose(np.asarray(s), [2.5, 2.5], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t), [1.25, 1.25], rtol=1e-4)


def test_ssi_loss_matches_torch_oracle():
    pred = np.abs(_rand((3, 16, 16), 1))
    tgt = np.abs(_rand((3, 16, 16), 2))
    mask = (_rand((3, 16, 16), 3) > -0.5).astype(np.float32)
    want = torch_ssi_loss(pred, tgt, mask)
    got = float(scale_and_shift_invariant_loss(pred, tgt, mask))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssi_loss_invariant_to_affine_pred():
    pred = np.abs(_rand((2, 16, 16), 4)) + 0.1
    tgt = np.abs(_rand((2, 16, 16), 5)) + 0.1
    mask = np.ones_like(pred)
    l1 = float(scale_and_shift_invariant_loss(pred, tgt, mask))
    l2 = float(scale_and_shift_invariant_loss(3.0 * pred + 7.0, tgt, mask))
    np.testing.assert_allclose(l1, l2, rtol=1e-3)


def test_masked_bce_matches_torch():
    p = np.clip(np.abs(_rand((2, 3, 8, 8), 6)), 0.01, 0.99).astype(np.float32)
    y = (_rand((2, 3, 8, 8), 7) > 0).astype(np.float32)
    mask = np.ones_like(p)
    want = float(
        torch.nn.BCELoss(reduction="mean")(torch.as_tensor(p), torch.as_tensor(y))
    )
    got = float(masked_bce_loss(p, y, mask))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_bce_pos_weight_matches_torch():
    """pos_weight multiplies the positive-class term with torch
    BCEWithLogitsLoss(pos_weight=...) semantics (we pass probabilities,
    torch takes logits — same loss surface)."""
    p = np.clip(np.abs(_rand((2, 64), 22)), 0.01, 0.99).astype(np.float32)
    y = (_rand((2, 64), 23) > 0.8).astype(np.float32)
    mask = np.ones_like(p)
    pw = 37.5
    logits = np.log(p / (1.0 - p)).astype(np.float32)
    want = float(
        torch.nn.BCEWithLogitsLoss(
            reduction="mean", pos_weight=torch.tensor(pw)
        )(torch.as_tensor(logits), torch.as_tensor(y))
    )
    got = float(masked_bce_loss(p, y, mask, pos_weight=pw))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_joint_loss_weights():
    pred = np.abs(_rand((1, 8, 8), 8))
    tgt = np.abs(_rand((1, 8, 8), 9))
    m = np.ones_like(pred)
    sp = np.clip(np.abs(_rand((1, 2, 8, 8), 10)), 0.01, 0.99)
    st = (_rand((1, 2, 8, 8), 11) > 0).astype(np.float32)
    sm = np.ones_like(sp)
    total, aux = joint_loss(pred, tgt, m, sp, st, sm, loss_weights=(0.75, 0.25))
    np.testing.assert_allclose(
        float(total),
        0.75 * float(aux["loss_disp"]) + 0.25 * float(aux["loss_seg"]),
        rtol=1e-6,
    )


def test_depth_metrics_perfect_prediction():
    gt = np.abs(_rand((2, 8, 8), 12)) + 0.5
    m = compute_masked_errors(gt, gt, np.ones_like(gt, dtype=bool))
    assert m.rmse == 0.0 and m.abs_rel == 0.0 and m.a1 == 1.0


def test_ssi_aligned_metrics_fix_affine_offset():
    gt = np.abs(_rand((1, 16, 16), 13)) + 1.0
    pred = 0.5 * gt - 0.2  # affine-transformed prediction
    m = ssi_aligned_depth_metrics(gt, pred, np.ones_like(gt, dtype=bool))
    assert m.rmse < 1e-4 and m.a1 == 1.0


def test_seg_iou():
    gt = np.zeros((1, 2, 4, 4), np.float32)
    pred = np.zeros((1, 2, 4, 4), np.float32)
    gt[0, 0, :2] = 1.0
    pred[0, 0, :2] = 1.0  # class 0 perfect
    gt[0, 1, :, :2] = 1.0
    pred[0, 1] = 0.0  # class 1 empty pred -> IoU 0
    np.testing.assert_allclose(seg_iou(gt, pred), 0.5, atol=1e-6)


def test_ssi_loss_empty_mask_is_zero_not_nan():
    pred = np.abs(_rand((2, 8, 8), 20)) + 0.1
    tgt = np.abs(_rand((2, 8, 8), 21)) + 0.1
    mask = np.zeros_like(pred)
    l = float(scale_and_shift_invariant_loss(pred, tgt, mask))
    assert l == 0.0 and np.isfinite(l)


def test_masked_bce_empty_mask_is_zero():
    p = np.full((1, 2, 4, 4), 0.5, np.float32)
    y = np.ones_like(p)
    l = float(masked_bce_loss(p, y, np.zeros_like(p)))
    assert l == 0.0


def test_depth_metrics_empty_mask_clamped():
    gt = np.ones((1, 4, 4))
    m = compute_masked_errors(gt, gt, np.zeros_like(gt, dtype=bool))
    assert m.rmse == 0.0 and m.a1 == 0.0  # reference NaN->0 clamps


def test_ssi_loss_from_net_matches_resize_then_ssi():
    """The fused net-resolution SSI loss (pyramid folded into the resize
    matrices, losses.ssi_loss_from_net) must equal resize -> ssi with
    strided-slice pyramids — the two are the same math, reordered."""
    import jax.numpy as jnp

    from soccdpt_tpu.ops.resize import resize_nchw
    from soccdpt_tpu.train.losses import ssi_loss_from_net

    rng = np.random.default_rng(11)
    pred_net = rng.standard_normal((2, 24, 32)).astype(np.float32)
    tgt = np.abs(rng.standard_normal((2, 96, 128))).astype(np.float32)
    mask = (rng.random((2, 96, 128)) > 0.2).astype(np.float32)

    ref = scale_and_shift_invariant_loss(
        resize_nchw(jnp.asarray(pred_net), (96, 128), "bicubic", False),
        jnp.asarray(tgt),
        jnp.asarray(mask),
    )
    got = ssi_loss_from_net(
        jnp.asarray(pred_net), jnp.asarray(tgt), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_ssi_loss_from_net_matches_torch_oracle():
    """End-to-end against the independent torch oracle: bicubic resize
    (torch-exact matrices) then the reference SSI loss."""
    import jax.numpy as jnp

    from soccdpt_tpu.ops.resize import resize_nchw
    from soccdpt_tpu.train.losses import ssi_loss_from_net

    rng = np.random.default_rng(13)
    pred_net = rng.standard_normal((2, 16, 16)).astype(np.float32)
    tgt = np.abs(rng.standard_normal((2, 64, 96))).astype(np.float32)
    mask = np.ones((2, 64, 96), np.float32)

    pred_full = np.asarray(
        resize_nchw(jnp.asarray(pred_net), (64, 96), "bicubic", False)
    )
    want = torch_ssi_loss(pred_full, tgt, mask)
    got = float(
        ssi_loss_from_net(jnp.asarray(pred_net), jnp.asarray(tgt), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_subsample2_matches_strided_slice():
    from soccdpt_tpu.train.losses import _subsample2

    x = _rand((3, 10, 16), 17)
    np.testing.assert_array_equal(np.asarray(_subsample2(x)), x[:, ::2, ::2])
    # odd sizes take the fallback path
    y = _rand((2, 7, 9), 18)
    np.testing.assert_array_equal(np.asarray(_subsample2(y)), y[:, ::2, ::2])
