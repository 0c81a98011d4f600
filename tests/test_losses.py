import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from mindtheedge_tpu.losses import supervised as S
from mindtheedge_tpu.losses.grad_loss import grad_layer, class_balanced_bce, grad_loss


def test_silog_matches_torch_formula():
    rng = np.random.RandomState(0)
    pred = rng.rand(2, 8, 10, 1).astype(np.float32) + 0.1
    gt = rng.rand(2, 8, 10, 1).astype(np.float32) + 0.1
    mask = gt > 0.5

    # torch-style reference computation over the masked elements
    p = torch.from_numpy(pred[mask])
    g = torch.from_numpy(gt[mask])
    log_diff = torch.log(p * 10) - torch.log(g * 10)
    expected = float(torch.sqrt(torch.mean(log_diff ** 2) -
                                0.85 * log_diff.mean() ** 2) * 10)

    ours = float(S.silog_loss(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray(mask)))
    assert ours == pytest.approx(expected, rel=1e-4)


def test_sparse_masking_mean_over_valid_only():
    pred = jnp.ones((1, 4, 4, 1)) * 2.0
    gt = jnp.zeros((1, 4, 4, 1)).at[0, 0, 0, 0].set(1.0)
    # sparse-l1: only the single valid pixel counts: |2+1e-5 - 1| = 1.00001
    loss = S.supervised_loss([pred], gt, 'sparse-l1', num_scales=1)
    assert float(loss) == pytest.approx(1.00001, rel=1e-5)


def test_berhu_threshold_behaviour():
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.rand(1, 6, 6, 1).astype(np.float32))
    gt = jnp.asarray(rng.rand(1, 6, 6, 1).astype(np.float32))
    mask = jnp.ones_like(gt, dtype=bool)
    val = float(S.berhu_loss(pred, gt, mask))
    assert np.isfinite(val) and val >= 0


def test_grad_layer_magnitude_vs_directional():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 16, 20, 1).astype(np.float32))
    mag, xv, xh = grad_layer(x)
    assert mag.shape == x.shape
    # with normals pointing vertically (pi/2), the selected derivative is |v|
    normal = jnp.full_like(x, np.pi / 2)
    mag_dir, _, _ = grad_layer(x, normal)
    np.testing.assert_allclose(np.asarray(mag_dir), np.abs(np.asarray(xv)),
                               atol=1e-6)


def test_class_balanced_bce_balance():
    # all-negative GT: alpha -> 1, only positive term would count (and is 0)
    prob = jnp.full((1, 8, 8, 1), 0.001)
    gt = jnp.zeros((1, 8, 8, 1))
    loss = float(class_balanced_bce(prob, gt))
    # alpha = neg/(pos+neg) = 1 -> (1-alpha)=0 kills the negative term
    assert loss == pytest.approx(0.0, abs=1e-6)

    gt2 = gt.at[0, 2, 2, 0].set(1.0)
    loss2 = float(class_balanced_bce(prob, gt2))
    # one confident wrong positive among 64 px: alpha=(63/64),
    # loss = alpha * -log(p + 1e-3) / 64 (negative term ~0)
    expected = (63 / 64) * -np.log(0.001 + 0.001) / 64
    assert loss2 == pytest.approx(expected, rel=1e-3)


def test_grad_loss_end_to_end_is_differentiable():
    rng = np.random.RandomState(3)
    depth = jnp.asarray(rng.rand(1, 16, 24, 1).astype(np.float32) * 50)
    edge = jnp.asarray((rng.rand(1, 32, 48, 1) > 0.9).astype(np.float32))

    def f(d):
        loss, _ = grad_loss(d, edge, is_grad=True, is_sigmoid=True,
                            sigmoid_thresh=4.0)
        return loss

    g = jax.grad(f)(depth)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def _ref_comp_cross_entropy(gt_edge, gt_mask, prob, pos_to_neg=1.0):
    """Numpy oracle of reference comp_cross_entropy (grad_loss.py:161-219):
    alpha always mask-weighted; loss mask-zeroing + mask.sum() normalizer
    ONLY for exactly-binary {0,1} masks, else unmasked / numel."""
    axes = (1, 2, 3)
    pos = -gt_edge * np.log(prob + 0.001)
    wpos = (gt_edge * gt_mask).sum(axis=axes)
    negm = 1.0 - gt_edge
    wneg = (negm * gt_mask).sum(axis=axes)
    alpha = np.ones_like(wneg) if wneg.sum() == 0 else wneg / (wpos + wneg)
    neg = -negm * np.log(1.0 - prob + 0.001)
    u = np.unique(gt_mask)
    if len(u) == 2 and (u == 1).any() and (u == 0).any():
        pos = np.where(gt_mask == 0, 0.0, pos)
        neg = np.where(gt_mask == 0, 0.0, neg)
        valid = gt_mask.sum()
    else:
        valid = float(gt_edge.size)
    total = (pos_to_neg * alpha * pos.sum(axis=axes) +
             (1.0 - alpha) * neg.sum(axis=axes)).sum()
    return total / valid


@pytest.mark.parametrize('mask_kind', ['binary', 'continuous', 'all_ones',
                                       'zero_half'])
def test_class_balanced_bce_mask_gating_matches_reference(mask_kind):
    """Reference gates mask-zeroing on the mask being exactly binary {0,1};
    continuous masks fall back to unmasked losses / numel (VERDICT r2 #7a)."""
    rng = np.random.RandomState(7)
    prob = rng.rand(2, 8, 10, 1).astype(np.float32) * 0.98 + 0.01
    gt = (rng.rand(2, 8, 10, 1) > 0.8).astype(np.float32)
    if mask_kind == 'binary':
        mask = (rng.rand(2, 8, 10, 1) > 0.3).astype(np.float32)
    elif mask_kind == 'continuous':
        mask = rng.choice([0.0, 0.5, 1.0], size=(2, 8, 10, 1)).astype(np.float32)
    elif mask_kind == 'all_ones':
        mask = np.ones((2, 8, 10, 1), np.float32)
    else:  # {0, 0.5}: two unique values but not {0,1} -> unmasked path
        mask = rng.choice([0.0, 0.5], size=(2, 8, 10, 1)).astype(np.float32)
    expected = _ref_comp_cross_entropy(gt, mask, prob)
    ours = float(jax.jit(class_balanced_bce)(
        jnp.asarray(prob), jnp.asarray(gt), jnp.asarray(mask)))
    assert ours == pytest.approx(expected, rel=1e-5)


def test_grad_loss_packed_fast_path_matches_unpacked():
    """The W-phase-packed grad->sigmoid->BCE fast path == the unpacked
    formulation (values to float tolerance; the BCE is sum-based and
    layout-invariant).  Covers both directional (normals) and magnitude."""
    import jax.numpy as jnp
    from mindtheedge_tpu.losses.grad_loss import (
        grad_loss, grad_layer, class_balanced_bce)

    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 64          # W divisible by 32 -> fast path active
    out = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 10)
    gt = jnp.asarray((rng.rand(B, H, W, 1) > 0.9).astype(np.float32))
    normals = jnp.asarray(((rng.rand(B, H, W, 1) * 2 - 1) * np.pi)
                          .astype(np.float32))

    for gn in (None, normals):
        loss_fast, grad_fast = grad_loss(
            out, gt, is_grad=True, is_sigmoid=True, sigmoid_thresh=4.0,
            gt_normals=gn, edge_loss_type='cross_entropy', weight=10.0)
        mag, _, _ = grad_layer(out, gn)
        prob = 1.0 / (1.0 + jnp.exp(-(mag - 4.0)))
        loss_ref = 10.0 * jnp.mean(class_balanced_bce(prob, gt))
        np.testing.assert_allclose(float(loss_fast), float(loss_ref),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grad_fast), np.asarray(mag),
                                   rtol=1e-5, atol=1e-5)

    # odd width -> falls back to the unpacked path (still correct)
    out_o = out[:, :, :63]
    gt_o = gt[:, :, :63]
    l1, _ = grad_loss(out_o, gt_o, is_grad=True, is_sigmoid=True,
                      edge_loss_type='cross_entropy')
    mag_o, _, _ = grad_layer(out_o, None)
    prob_o = 1.0 / (1.0 + jnp.exp(-(mag_o - 4.0)))
    np.testing.assert_allclose(
        float(l1), float(jnp.mean(class_balanced_bce(prob_o, gt_o))),
        rtol=1e-5)
