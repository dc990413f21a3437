"""Stage-2: loss parity vs torch formulas, readout, full forward/evaluate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.models import loss as L
from ullava_tpu.models import ullava
from ullava_tpu.models.generate import GenerateConfig


# --------------------------------------------------------------------------
# Loss parity: the reference's formulas re-stated in torch.
# --------------------------------------------------------------------------
def test_dice_loss_matches_reference_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    preds = rng.standard_normal((4, 8, 8)).astype(np.float32)  # 4 masks
    gts = (rng.random((4, 8, 8)) > 0.5).astype(np.float32)

    # torch restatement of dice with scale=1000 (numerator scales inputs only)
    tp = torch.tensor(preds).sigmoid().flatten(1)
    tt = torch.tensor(gts).flatten(1)
    num = 2 * (tp / 1000 * tt).sum(-1)
    den = (tp / 1000).sum(-1) + (tt / 1000).sum(-1)
    ref = ((1 - (num + 1e-6) / (den + 1e-6)).sum() / (4 + 1e-8)).item()

    got = float(
        L.dice_loss(
            jnp.asarray(preds)[None], jnp.asarray(gts)[None],
            jnp.ones((1, 4), bool),
        )
    )
    assert abs(got - ref) < 1e-5


def test_sigmoid_ce_matches_reference_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    preds = rng.standard_normal((3, 6, 6)).astype(np.float32)
    gts = (rng.random((3, 6, 6)) > 0.5).astype(np.float32)

    ref_t = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(preds), torch.tensor(gts), reduction="none"
    ).flatten(1).mean(1).sum() / (3 + 1e-8)

    got = float(
        L.sigmoid_ce_loss(
            jnp.asarray(preds)[None], jnp.asarray(gts)[None], jnp.ones((1, 3), bool)
        )
    )
    assert abs(got - ref_t.item()) < 1e-5


def test_giou_loss_matches_reference_values():
    # The reference's own __main__ smoke data (models/loss.py:117-122):
    box1 = np.array([[2, 3.1, 7, 5], [3, 4, 8, 4.8], [4, 4, 5.6, 7]], np.float32)
    box2 = np.array([[2, 4, 7, 9], [3, 4, 8, 4.8], [4, 4, 5.6, 7]], np.float32)
    got = float(
        L.bbox_giou_loss(
            jnp.asarray(box1)[None], jnp.asarray(box2)[None], jnp.ones((1, 3), bool)
        )
    )
    # elementwise giou: box2/box1 pair 0 overlap: inter = [2,4,7,5] -> 5*1=5
    # union = 5*1.9 + 5*5 - 5 = 29.5; iou = 5/29.5; hull = [2,3.1,7,9] -> 5*5.9
    # giou = iou - (29.5-29.5)/29.5 ... compute directly:
    iou0 = 5.0 / 29.5
    hull0 = 5 * 5.9
    giou0 = iou0 - (hull0 - 29.5) / hull0
    # Per-sample mean over its 3 boxes, then / total boxes again — the
    # reference composition double-normalizes box losses
    # (`models/ullava.py:318,320`; see loss.py module docstring).
    per_sample = ((1 - giou0) + 0.0 + 0.0) / (3 + 1e-8)
    expected = per_sample / (3 + 1e-8)
    assert abs(got - expected) < 1e-5


def test_giou_skips_degenerate_but_counts_them():
    pred = np.array([[0, 0, 1, 1], [2, 2, 1, 1]], np.float32)  # second degenerate
    gt = np.array([[0, 0, 1, 1], [0, 0, 1, 1]], np.float32)
    got = float(
        L.bbox_giou_loss(jnp.asarray(pred)[None], jnp.asarray(gt)[None], jnp.ones((1, 2), bool))
    )
    assert abs(got - 0.0) < 1e-6  # perfect box: 0; degenerate excluded from sum


def test_l1_loss_sums_coords():
    pred = np.zeros((1, 2, 4), np.float32)
    gt = np.ones((1, 2, 4), np.float32)
    got = float(L.bbox_l1_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.ones((1, 2), bool)))
    # sum |1| over 8 coords / 2 boxes (sample) / 2 boxes (total): the
    # reference's double normalization (`models/ullava.py:311,319`).
    assert abs(got - 8.0 / 2 / 2) < 1e-6


def test_pixel_valid_masks_padding():
    rng = np.random.default_rng(2)
    preds = jnp.asarray(rng.standard_normal((1, 1, 8, 8)), jnp.float32)
    gts = jnp.zeros((1, 1, 8, 8))
    pv = jnp.zeros((1, 8, 8), bool).at[:, :4, :4].set(True)
    full = float(L.sigmoid_ce_loss(preds, gts, jnp.ones((1, 1), bool)))
    crop = float(L.sigmoid_ce_loss(preds, gts, jnp.ones((1, 1), bool), pv))
    # Cropped loss equals the mean over just the 4x4 region.
    manual = float(
        L.sigmoid_ce_loss(preds[:, :, :4, :4], gts[:, :, :4, :4], jnp.ones((1, 1), bool))
    )
    assert abs(crop - manual) < 1e-6
    assert abs(full - crop) > 1e-9  # it actually changed


# --------------------------------------------------------------------------
# Stage-2 model
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_stage2():
    cfg = ullava.UllavaConfig.tiny()
    params = ullava.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _stage2_batch(cfg, rng, B=2, S=20):
    ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    # two [SEG] and one [LOC] in sample 0; one of each in sample 1
    ids[0, 5] = cfg.seg_token_idx
    ids[0, 8] = cfg.seg_token_idx
    ids[0, 11] = cfg.loc_token_idx
    ids[1, 4] = cfg.seg_token_idx
    ids[1, 7] = cfg.loc_token_idx
    labels = ids.copy()
    attn_lens = np.array([S, S - 4], dtype=np.int32)
    F = cfg.mask_loss_frame
    batch = dict(
        input_ids=jnp.asarray(ids),
        labels=jnp.asarray(labels),
        attn_lens=jnp.asarray(attn_lens),
        images=jnp.asarray(rng.standard_normal((B, 28, 28, 3)), jnp.float32),
        images_sam=jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32),
        gt_masks=jnp.asarray((rng.random((B, cfg.max_masks, F, F)) > 0.5), jnp.float32),
        mask_valid=jnp.asarray([[True, True, False], [True, False, False]]),
        gt_boxes=jnp.asarray(rng.random((B, cfg.max_boxes, 4)), jnp.float32),
        box_valid=jnp.asarray([[True, False, False], [True, False, False]]),
        input_hw=jnp.asarray([[64, 48], [32, 64]], jnp.int32),
    )
    return batch


def test_stage2_forward_losses(tiny_stage2):
    cfg, params = tiny_stage2
    batch = _stage2_batch(cfg, np.random.default_rng(3))
    out = ullava.forward(params, cfg, **batch)
    for key in ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss", "bbox_loss"):
        assert np.isfinite(float(out[key])), key
    # seg readout found the right counts
    np.testing.assert_array_equal(
        np.asarray(out["seg_valid"]).sum(1), [2, 1]
    )
    np.testing.assert_array_equal(
        np.asarray(out["loc_valid"]).sum(1), [1, 1]
    )
    assert out["pred_masks"].shape == (2, cfg.max_masks, 64, 64)
    assert out["pred_boxes"].shape == (2, cfg.max_boxes, 4)


def test_stage2_grads_flow_to_heads_not_encoders(tiny_stage2):
    cfg, params = tiny_stage2
    batch = _stage2_batch(cfg, np.random.default_rng(4))

    def loss_fn(p):
        return ullava.forward(p, cfg, **batch)["loss"]

    g = jax.grad(loss_fn)(params)
    # Trainable heads receive gradients.
    assert float(jnp.abs(g["seg_projector"]["fc0"]["w"]).sum()) > 0
    assert float(jnp.abs(g["det_projector"]["fc0"]["w"]).sum()) > 0
    assert float(jnp.abs(g["det_decoder"]["fc0"]["w"]).sum()) > 0
    assert float(jnp.abs(g["sam"]["mask_decoder"]["iou_token"]).sum()) >= 0
    mask_dec_grad = jnp.abs(g["sam"]["mask_decoder"]["layers"][0]["self_attn"]["q"]["w"]).sum()
    assert float(mask_dec_grad) > 0
    # Frozen SAM encoder gets exactly zero grads (stop_gradient).
    enc_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g["sam"]["image_encoder"], 0.0
    )
    assert enc_grad == 0.0
    # CLIP tower frozen too.
    clip_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g["core"]["vision"], 0.0
    )
    assert clip_grad == 0.0


def test_stage2_inference_mode(tiny_stage2):
    cfg, params = tiny_stage2
    batch = _stage2_batch(cfg, np.random.default_rng(5))
    out = ullava.forward(params, cfg, **{**batch, "labels": None}, inference=True)
    assert "loss" not in out
    assert out["low_res_masks"].shape[0] == 2


def test_stage2_evaluate_pipeline(tiny_stage2):
    cfg, params = tiny_stage2
    rng = np.random.default_rng(6)
    B, S = 1, 10
    ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    out = ullava.evaluate(
        params, cfg, GenerateConfig(max_new_tokens=6, temperature=0.0),
        input_ids=jnp.asarray(ids),
        prompt_lens=jnp.asarray([S], np.int32),
        images=jnp.asarray(rng.standard_normal((B, 28, 28, 3)), jnp.float32),
        images_sam=jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32),
    )
    assert out["sequences"].shape == (B, S + 6)
    assert out["low_res_masks"].shape == (B, cfg.max_masks, 16, 16)
    assert out["pred_boxes"].shape == (B, cfg.max_boxes, 4)
