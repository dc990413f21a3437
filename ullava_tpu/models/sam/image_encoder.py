"""SAM ViTDet image encoder, TPU-native.

Functional re-design of the reference's vendored encoder
(`/root/reference/models/segment_anything/modeling/image_encoder.py`):
ViT backbone with window attention (period-grouped `lax.scan`) + global
blocks, decomposed relative position bias, and a conv neck to the
256-channel embedding. Layout is NHWC throughout; the neck's LayerNorm2d
becomes a plain last-axis layer_norm. The reference's fp16 autocast guard
around the neck (`image_encoder.py:118-124`) is subsumed by fp32 norm
statistics.

Blocks are stored as two stacked pytrees — window blocks [G, P-1, ...]
and global blocks [G, ...] where the depth factors into G groups of P
layers with a global block closing each group (true for ViT-B/L/H:
global_attn_indexes are {P-1, 2P-1, ...}). One traced window body + one
global body regardless of depth.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ullava_tpu.ops.attention import attention_xla
from ullava_tpu.ops.norms import layer_norm
from ullava_tpu.ops.quant import apply_linear
from ullava_tpu.ops.sam_attention import (
    decomposed_bias_terms,
    fused_global_attention,
    fused_window_attention,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SamVisionConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    use_rel_pos: bool = True
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    # Window-attention kernel: 'auto' uses the fused Pallas rel-pos kernel
    # on TPU for window blocks (global blocks stay on XLA), 'xla' forces
    # the reference path, 'pallas'/'pallas_interpret' force the kernel.
    attn_kernel: str = "auto"
    # Serving-only: run the fused-MLP kernel's dots int8 x int8 with
    # per-row dynamic activation quantization (~1.6x MXU rate on v5e).
    # Off by default: weight-only int8 is numerically strictly closer to
    # the bf16 reference.
    mlp_w8a8: bool = False
    # Serving-only: same int8-activation treatment for the attention
    # qkv/proj projections (~2 TFLOP/img otherwise running bf16-rate).
    attn_w8a8: bool = False
    # Serving-only: run the attention SCORE dots (qk + rel-pos bias
    # expansion) int8 x int8 with per-row dynamic quantization inside the
    # kernels; the av dot stays bf16 (int8 probabilities would truncate
    # diffuse attention). This is the fused-path resolution of the old
    # `attn_w8a8` question — the projections themselves already run
    # int8 x int8 via the fused LN+qkv / proj kernels when `mlp_w8a8`.
    attn_dots_i8: bool = False
    # Window-block token layout: 'auto' keeps tokens in the compact
    # pad-free window-major layout across each group's window blocks
    # whenever the Pallas kernels are active (grid restored only at the
    # global blocks); 'block' forces the reference-style per-block
    # partition/unpartition; 'resident' forces the resident layout.
    window_layout: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_groups(self) -> int:
        return len(self.global_attn_indexes)

    @property
    def group_period(self) -> int:
        return self.depth // self.num_groups

    def validate_grouping(self) -> None:
        p = self.group_period
        expected = tuple((i + 1) * p - 1 for i in range(self.num_groups))
        if expected != tuple(self.global_attn_indexes) or p * self.num_groups != self.depth:
            raise NotImplementedError(
                f"global_attn_indexes {self.global_attn_indexes} do not close "
                f"uniform groups of {p}; got expected {expected}"
            )

    @classmethod
    def tiny(cls, **kw) -> "SamVisionConfig":
        defaults = dict(
            img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
            out_chans=16, window_size=2, global_attn_indexes=(1, 3),
            dtype=jnp.float32,
        )
        defaults.update(kw)
        return cls(**defaults)


def _block_init(key, cfg: SamVisionConfig, n: int, window: bool) -> Params:
    """`n` stacked transformer blocks ([] leading axis when n is None)."""
    C, F, hd = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio), cfg.head_dim
    size = cfg.window_size if window else cfg.grid
    rel = 2 * size - 1
    ks = jax.random.split(key, 4)

    def w(k, shape):
        return (0.02 * jax.random.normal(k, (n,) + shape, jnp.float32)).astype(cfg.dtype)

    return {
        "ln1_scale": jnp.ones((n, C), cfg.dtype),
        "ln1_bias": jnp.zeros((n, C), cfg.dtype),
        "qkv": w(ks[0], (C, 3 * C)),
        "qkv_bias": jnp.zeros((n, 3 * C), cfg.dtype),
        "proj": w(ks[1], (C, C)),
        "proj_bias": jnp.zeros((n, C), cfg.dtype),
        "rel_pos_h": jnp.zeros((n, rel, hd), cfg.dtype),
        "rel_pos_w": jnp.zeros((n, rel, hd), cfg.dtype),
        "ln2_scale": jnp.ones((n, C), cfg.dtype),
        "ln2_bias": jnp.zeros((n, C), cfg.dtype),
        "fc1": w(ks[2], (C, F)),
        "fc1_bias": jnp.zeros((n, F), cfg.dtype),
        "fc2": w(ks[3], (F, C)),
        "fc2_bias": jnp.zeros((n, C), cfg.dtype),
    }


def init_params(rng: jax.Array, cfg: SamVisionConfig) -> Params:
    cfg.validate_grouping()
    k = jax.random.split(rng, 6)
    C, g = cfg.embed_dim, cfg.grid
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "patch_proj": (0.02 * jax.random.normal(k[0], (patch_dim, C), jnp.float32)).astype(cfg.dtype),
        "patch_bias": jnp.zeros((C,), cfg.dtype),
        "pos_embed": jnp.zeros((g, g, C), cfg.dtype),
        "window_blocks": _block_init(k[1], cfg, cfg.num_groups * (cfg.group_period - 1), True),
        "global_blocks": _block_init(k[2], cfg, cfg.num_groups, False),
        "neck_conv1": (0.02 * jax.random.normal(k[3], (C, cfg.out_chans), jnp.float32)).astype(cfg.dtype),
        "neck_ln1_scale": jnp.ones((cfg.out_chans,), cfg.dtype),
        "neck_ln1_bias": jnp.zeros((cfg.out_chans,), cfg.dtype),
        "neck_conv2": (0.02 * jax.random.normal(k[4], (3, 3, cfg.out_chans, cfg.out_chans), jnp.float32)).astype(cfg.dtype),
        "neck_ln2_scale": jnp.ones((cfg.out_chans,), cfg.dtype),
        "neck_ln2_bias": jnp.zeros((cfg.out_chans,), cfg.dtype),
    }


def pack_sam_attention(enc: Params, cfg: SamVisionConfig, head_pad: int = 128) -> Params:
    """Serving-time weight repack: reorder qkv/proj so each head's slice
    is a zero-padded `head_pad`-lane block ([C, 3, H, hp] column order).
    The packed Pallas kernels then read q/k/v of a head as one 128-aligned
    lane block of the projection output — the per-block [B,S,3,H,hd]
    reshape + head split + [B,H,S,hd] transpose HBM copies disappear.
    Zero pads are exact (they never mix with real lanes). Detection is by
    shape: qkv out width 3*H*hp instead of 3*H*hd."""
    from ullava_tpu.ops.quant import is_quantized

    H, hd, hp = cfg.num_heads, cfg.head_dim, head_pad
    if hd >= hp:
        return enc

    def pad_cols(w, fill=0.0):
        # [..., 3*H*hd] -> [..., 3, H, hd] -> pad -> [..., 3*H*hp]
        lead = w.shape[:-1]
        w = w.reshape(*lead, 3, H, hd)
        pad = [(0, 0)] * (w.ndim - 1) + [(0, hp - hd)]
        w = jnp.pad(w, pad, constant_values=fill)
        return w.reshape(*lead, 3 * H * hp)

    def pad_rows(w):
        # [..., H*hd, C] -> [..., H, hd, C] -> pad -> [..., H*hp, C]
        lead, C = w.shape[:-2], w.shape[-1]
        w = w.reshape(*lead, H, hd, C)
        pad = [(0, 0)] * (w.ndim - 2) + [(0, hp - hd), (0, 0)]
        w = jnp.pad(w, pad)
        return w.reshape(*lead, H * hp, C)

    def pack_blocks(blk):
        blk = dict(blk)
        if is_quantized(blk["qkv"]):
            blk["qkv"] = {
                "q": pad_cols(blk["qkv"]["q"]),
                "scale": pad_cols(blk["qkv"]["scale"], fill=1.0),
            }
        else:
            blk["qkv"] = pad_cols(blk["qkv"])
        blk["qkv_bias"] = pad_cols(blk["qkv_bias"])
        if is_quantized(blk["proj"]):
            blk["proj"] = {
                "q": pad_rows(blk["proj"]["q"]),
                "scale": blk["proj"]["scale"],
            }
        else:
            blk["proj"] = pad_rows(blk["proj"])
        # rel_pos lanes pad with zeros: q pad lanes are zero too, so the
        # bias einsum is unchanged.
        for k in ("rel_pos_h", "rel_pos_w"):
            blk[k] = jnp.pad(blk[k], [(0, 0)] * (blk[k].ndim - 1) + [(0, hp - hd)])
        return blk

    out = dict(enc)
    out["window_blocks"] = pack_blocks(enc["window_blocks"])
    out["global_blocks"] = pack_blocks(enc["global_blocks"])
    return out


def rel_pos_bias(
    q: jax.Array,  # [B, H, qh, qw, hd]
    rel_pos_h: jax.Array,  # [2*size-1, hd]
    rel_pos_w: jax.Array,
    size: int,
) -> jax.Array:
    """Decomposed relative position bias (reference
    `image_encoder.py:321-393`): bias[qh,qw,kh,kw] = q.Rh[qh,kh] + q.Rw[qw,kw]."""
    coords = jnp.arange(size)
    rel = coords[:, None] - coords[None, :] + (size - 1)  # [size, size]
    Rh = rel_pos_h[rel]  # [qh, kh, hd]
    Rw = rel_pos_w[rel]  # [qw, kw, hd]
    qf = q.astype(jnp.float32)
    bias_h = jnp.einsum("bhqwc,qkc->bhqwk", qf, Rh.astype(jnp.float32))
    bias_w = jnp.einsum("bhqwc,wkc->bhqwk", qf, Rw.astype(jnp.float32))
    # [B, H, qh, qw, kh, kw] -> [B, H, qh*qw, kh*kw]
    B, H = q.shape[0], q.shape[1]
    bias = bias_h[..., :, None] + bias_w[..., None, :]
    return bias.reshape(B, H, size * size, size * size)


def _use_pallas(cfg: SamVisionConfig, size: int) -> bool:
    if not cfg.use_rel_pos:
        return False
    mode = cfg.attn_kernel
    if mode in ("pallas", "pallas_interpret"):
        return True
    if mode == "auto":
        try:
            return jax.devices()[0].platform == "tpu"
        except RuntimeError:
            return False
    return False


def _bias_terms_packed(q_grid, rel_pos_h, rel_pos_w, size):
    """[B, i, j, H, hp] queries -> ([B, H, S, W], [B, H, S, W]) bias terms
    (head-second order: exactly what the packed kernels block on)."""
    coords = jnp.arange(size)
    rel = coords[:, None] - coords[None, :] + (size - 1)
    RhG = rel_pos_h[rel].astype(jnp.float32)  # [i, a, hp]
    RwG = rel_pos_w[rel].astype(jnp.float32)
    qf = q_grid.astype(jnp.float32)
    A = jnp.einsum("nijhc,iac->nhija", qf, RhG)
    Bb = jnp.einsum("nijhc,jbc->nhijb", qf, RwG)
    B, H = A.shape[0], A.shape[1]
    S = size * size
    return A.reshape(B, H, S, size), Bb.reshape(B, H, S, size)


def _attn_packed(x: jax.Array, p: Params, cfg: SamVisionConfig, size: int) -> jax.Array:
    """Attention with pre-packed head-major qkv/proj weights
    (`pack_sam_attention`): per-head q/k/v are 128-aligned lane blocks of
    one projection output, so no head-split/transpose copies exist."""
    from ullava_tpu.ops.quant import is_quantized
    from ullava_tpu.ops.sam_attention import (
        fused_global_attention_packed,
        fused_window_attention_packed,
    )

    B = x.shape[0]
    C, H, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    S = size * size
    w = p["qkv"]["q"] if is_quantized(p["qkv"]) else p["qkv"]
    hp = w.shape[-1] // (3 * H)
    y = _lin(cfg, x.reshape(B, S, C), p["qkv"]) + p["qkv_bias"]  # [B,S,3*H*hp]

    q4 = y.reshape(B, S, 3, H, hp)[:, :, 0]  # [B, S, H, hp] (lane split: free)
    q_grid = q4.reshape(B, size, size, H, hp)
    A, Bb = _bias_terms_packed(q_grid, p["rel_pos_h"], p["rel_pos_w"], size)
    A = A.astype(y.dtype)
    Bb = Bb.astype(y.dtype)

    if _use_pallas(cfg, size):
        interp = cfg.attn_kernel == "pallas_interpret"
        fused = (
            fused_window_attention_packed if size <= 16
            else fused_global_attention_packed
        )
        out = fused(y, A, Bb, num_heads=H, head_pad=hp, window=size,
                    scale=hd**-0.5, interpret=interp)  # [B, S, H*hp]
    else:
        # Unpacked fallback (CPU/tests): slice heads back out and run the
        # XLA path with the expanded bias.
        qkv = y.reshape(B, S, 3, H, hp)[..., :hd]
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # A/Bb are [B,H,S,W]; expand to [B,H,S,S] with t = a*W + b.
        bias = (
            A.astype(jnp.float32)[..., :, None]
            + Bb.astype(jnp.float32)[..., None, :]
        ).reshape(B, H, S, S)
        out = attention_xla(q, k, v, bias=bias, scale=hd**-0.5)
        out = jnp.pad(
            out.reshape(B, S, H, hd), ((0, 0), (0, 0), (0, 0), (0, hp - hd))
        ).reshape(B, S, H * hp)
    out = _lin(cfg, out, p["proj"]) + p["proj_bias"]
    return out.reshape(B, size, size, C)


def _is_packed(p: Params, cfg: SamVisionConfig) -> bool:
    from ullava_tpu.ops.quant import is_quantized

    w = p["qkv"]["q"] if is_quantized(p["qkv"]) else p["qkv"]
    return w.shape[-1] != 3 * cfg.embed_dim


def _bias_terms_grid(y, rel_pos_h, rel_pos_w, cfg: SamVisionConfig, size: int):
    """Bias terms for `fused_window_attention_grid`, P-factorized.

    The i-batched einsum `A[s,h,a] = sum_c q[s,h,c] * Rh[i(s)-a+W-1, c]`
    makes XLA materialize awkward f32 [i, a, n, ...] intermediates with
    two layout copies (~6 ms/layer at ViT-H B=16). Factorize instead:
        P[s, h, r] = sum_c q[s,h,c] * rel_pos[r, c]   (r = 0..2W-2)
        A[s, h, a] = P[s, h, i(s) + W-1 - a]
    P is ONE clean matmul of q against a per-head block-diagonal weight
    (no relayout of q, which stays in its native (h, c) lane order), and
    the sliding-window selection is W static lane slices — the column
    reversal is absorbed by the kernel's one-hot order. The 1/scale
    prefold rides the block-diag weight for free.

    y: [N, S, 3C] qkv output; returns (A, Bb) each [H, N, S, W] in
    reversed column order, y.dtype.
    """
    return _bias_terms_rect(y, rel_pos_h, rel_pos_w, cfg, size, size, size)


def _bias_terms_rect(
    y, rel_pos_h, rel_pos_w, cfg: SamVisionConfig, rows: int, cols: int,
    W: int,
):
    """`_bias_terms_grid` generalized to a rows x cols REAL rectangle of a
    logical W x W window (the resident layout's boundary classes): queries
    exist only at real positions, but each still biases against all W key
    rows/cols of the logical window."""
    H, hd, C = cfg.num_heads, cfg.head_dim, cfg.embed_dim
    R = 2 * W - 1
    N, T, _ = y.shape
    inv = float(hd**0.5)  # 1/scale, folded into the weights

    def block_diag(rel):  # [R, hd] -> [C, H*R]
        w = jnp.zeros((C, H * R), y.dtype)
        blk = (rel.astype(jnp.float32) * inv).astype(y.dtype).T  # [hd, R]
        for h in range(H):
            w = jax.lax.dynamic_update_slice(w, blk, (h * hd, h * R))
        return w

    q = y[:, :, :C]
    Ph = (q @ block_diag(rel_pos_h)).reshape(N, rows, cols, H, R)
    Pw = (q @ block_diag(rel_pos_w)).reshape(N, rows, cols, H, R)
    # Static slice-assembly of the sliding windows (gather-free). The
    # result stays in the matmul's natural [N, T, H, W] row-major order
    # (the kernel lane-slices each head's W columns) — the head-leading
    # [H, N, T, W] transpose this used to do cost ~110 ms of HBM layout
    # copies per ViT-H B=48 encode.
    A = jnp.concatenate(
        [Ph[:, i : i + 1, :, :, i : i + W] for i in range(rows)], axis=1
    ).reshape(N, T, H * W)
    Bb = jnp.concatenate(
        [Pw[:, :, j : j + 1, :, j : j + W] for j in range(cols)], axis=2
    ).reshape(N, T, H * W)
    return A, Bb


def precompute_window_bias_weights(enc: Params, cfg: SamVisionConfig) -> Params:
    """Serving-time weight prep: fold the window blocks' decomposed
    rel-pos bias matmuls into the LN+qkv projection.

    The bias terms are linear in the qkv output's q lanes:
    A = (LN(x) @ Wq + bq) @ BD(rel_pos_h * sqrt(hd)), so the composite
    weight Wq @ BD ([C, H*(2W-1)] per layer) and constant bq @ BD are
    pure functions of frozen parameters. With them, the fused LN+qkv
    kernel emits the bias-term matrix P alongside y
    (`ops/mlp_kernel.fused_ln_linear_dual`) and the standalone bias
    matmuls + their layout copies disappear from the serve.

    Adds `biasw` (int8 per-column, [L, C, 2*H*R]; columns ordered
    [h-terms | w-terms] as [2, H, R]) and `biasw_bias` ([L, 2*H*R] f32)
    to `window_blocks`.

    Reference computation: `/root/reference/models/segment_anything/
    modeling/image_encoder.py:321-393`."""
    from ullava_tpu.ops.quant import dequantize, quantize_int8

    wb = enc["window_blocks"]
    C, H, hd, W = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.window_size
    R = 2 * W - 1
    inv = float(hd**0.5)  # 1/scale prefold, matching _bias_terms_rect
    wqkv = dequantize(wb["qkv"], jnp.float32)  # [L, C, 3C]
    L = wqkv.shape[0]
    wq = wqkv[..., :C].reshape(L, C, H, hd)
    rel_h = wb["rel_pos_h"].astype(jnp.float32) * inv  # [L, R, hd]
    rel_w = wb["rel_pos_w"].astype(jnp.float32) * inv
    comp_h = jnp.einsum("lchd,lrd->lchr", wq, rel_h)
    comp_w = jnp.einsum("lchd,lrd->lchr", wq, rel_w)
    comp = jnp.stack([comp_h, comp_w], axis=2).reshape(L, C, 2 * H * R)
    bq = wb["qkv_bias"][:, :C].astype(jnp.float32).reshape(L, H, hd)
    bc_h = jnp.einsum("lhd,lrd->lhr", bq, rel_h)
    bc_w = jnp.einsum("lhd,lrd->lhr", bq, rel_w)
    bconst = jnp.stack([bc_h, bc_w], axis=1).reshape(L, 2 * H * R)

    out = dict(enc)
    out["window_blocks"] = dict(wb)
    out["window_blocks"]["biasw"] = quantize_int8(comp)
    out["window_blocks"]["biasw_bias"] = bconst
    return out


def _assemble_bias_terms(
    P: jax.Array, rows: int, cols: int, W: int, H: int, pad_rows: int = 0
):
    """[N, rows*cols, 2*H*R] composite-kernel bias output -> (A, Bb)
    [N, rows*cols + pad_rows, H*W] in the reversed column order the window
    kernels expect (same slice-assembly as `_bias_terms_rect`, operating
    on precomputed P). `pad_rows` appends zero rows for the tile-aligned
    padded window layout (pad keys are masked in the kernel, so their
    bias values are irrelevant; zeros keep them finite)."""
    N, T, _ = P.shape
    R = 2 * W - 1
    P6 = P.reshape(N, rows, cols, 2, H, R)
    A = jnp.concatenate(
        [P6[:, i : i + 1, :, 0, :, i : i + W] for i in range(rows)], axis=1
    ).reshape(N, T, H * W)
    Bb = jnp.concatenate(
        [P6[:, :, j : j + 1, 1, :, j : j + W] for j in range(cols)], axis=2
    ).reshape(N, T, H * W)
    if pad_rows:
        tail = jnp.zeros((N, pad_rows, H * W), P.dtype)
        A = jnp.concatenate([A, tail], axis=1)
        Bb = jnp.concatenate([Bb, tail], axis=1)
    return A, Bb


def _lin(cfg: SamVisionConfig, x: jax.Array, w) -> jax.Array:
    from ullava_tpu.ops.quant import apply_linear_a8, is_quantized

    if cfg.attn_w8a8 and is_quantized(w):
        return apply_linear_a8(x, w)
    return apply_linear(x, w)


def _attn(x: jax.Array, p: Params, cfg: SamVisionConfig, size: int) -> jax.Array:
    """Self-attention over an NHWC token grid [B, size, size, C]."""
    if _is_packed(p, cfg):
        return _attn_packed(x, p, cfg, size)
    B = x.shape[0]
    C, H, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    S = size * size
    y = _lin(cfg, x.reshape(B, S, C), p["qkv"]) + p["qkv_bias"]  # [B, S, 3C]

    if _use_pallas(cfg, size) and size <= 16:
        # Grid-native window kernel: consumes y whole (head slicing and
        # output merging happen on VMEM lanes), so the HBM head-split /
        # merge transposes of the older pipeline don't exist. Bias terms
        # stay in the einsum's unmerged [N, H, i, j, a] layout, pre-scaled
        # so the kernel can fold them into the qk contraction.
        from ullava_tpu.ops.sam_attention import fused_window_attention_grid

        A, Bb = _bias_terms_grid(y, p["rel_pos_h"], p["rel_pos_w"], cfg, size)
        out = fused_window_attention_grid(
            y, A, Bb,
            num_heads=H, head_dim=hd, window=size, scale=hd**-0.5,
            dots_i8=cfg.attn_dots_i8,
            interpret=(cfg.attn_kernel == "pallas_interpret"),
        )  # [B, S, C] head-merged
        out = _lin(cfg, out, p["proj"]) + p["proj_bias"]
        return out.reshape(B, size, size, C)

    qkv = y.reshape(B, S, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    if _use_pallas(cfg, size):
        # Global grid (S = 4096): the tiled flash variant (the XLA
        # fallback would materialize [B, H, S, S] probs - 8.6 GB at
        # batch 8). Bias stays in its compact decomposed form.
        qh = q.transpose(0, 2, 1, 3)  # [B, H, S, hd]
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        q_grid = qh.reshape(B, H, size, size, hd)
        A, Bb = decomposed_bias_terms(
            q_grid, p["rel_pos_h"], p["rel_pos_w"], size
        )
        N = B * H
        out = fused_global_attention(
            qh.reshape(N, S, hd), kh.reshape(N, S, hd), vh.reshape(N, S, hd),
            A.reshape(N, S, size).astype(qh.dtype),
            Bb.reshape(N, S, size).astype(qh.dtype),
            window=size, scale=hd**-0.5,
            # Serving mode (int8 dots) also runs the softmax exp in bf16
            # — the S^2 exp is this kernel's floor; see _tiled_kernel.
            exp_bf16=cfg.mlp_w8a8,
            interpret=(cfg.attn_kernel == "pallas_interpret"),
        )
        out = out.reshape(B, H, S, hd).transpose(0, 2, 1, 3)
    else:
        bias = None
        if cfg.use_rel_pos:
            q_grid = q.transpose(0, 2, 1, 3).reshape(B, H, size, size, hd)
            # The reference adds rel-pos to the scaled logits with UNSCALED
            # q; attention_xla applies scale to qk only, matching that.
            bias = rel_pos_bias(q_grid, p["rel_pos_h"], p["rel_pos_w"], size)
        out = attention_xla(q, k, v, bias=bias, scale=hd**-0.5)
    out = _lin(cfg, out.reshape(B, S, C), p["proj"]) + p["proj_bias"]
    return out.reshape(B, size, size, C)


def _use_global_fused(p: Params, cfg: SamVisionConfig, size: int) -> bool:
    """Serving path for global blocks: LN1+qkv and proj+residual ride the
    fused int8 kernels (the XLA lowering spends ~110 ms per ViT-H B=48
    encode on the unfused qkv matmul + bias-add + layout copies, and runs
    the dots at bf16 rate)."""
    from ullava_tpu.ops.quant import is_quantized

    return (
        _use_pallas(cfg, size)
        and size > 16  # global grid only; window sizes use the grid kernels
        and is_quantized(p["qkv"])
        and is_quantized(p["proj"])
        and (size * size) % 1024 == 0
    )


def _global_head_group(cfg: SamVisionConfig) -> int:
    """Largest head slab whose q/k/v lanes form 128-aligned blocks of the
    raw qkv output (the `fused_global_attention_y` requirement); 0 when
    none exists (fall back to the transpose-staged kernel)."""
    for hg in (16, 8, 4, 2, 1):
        if cfg.num_heads % hg == 0 and (hg * cfg.head_dim) % 128 == 0:
            return hg
    return 0


def _bias_terms_global_natural(
    y: jax.Array, p: Params, cfg: SamVisionConfig, g: int
):
    """Decomposed-bias terms for `fused_global_attention_y`, computed from
    the raw qkv output's q lanes in their natural [B, i, j, H, hd] order —
    no [B,H,S,hd] head transpose — with the 1/scale prefold riding the
    RhG/RwG constants (kills the separate 800 MB-per-term rescale pass).
    Returns (A, Bb) each [B, S, H, g] in y.dtype."""
    B, S, _ = y.shape
    H, hd, C = cfg.num_heads, cfg.head_dim, cfg.embed_dim
    inv = float(hd**0.5)
    coords = jnp.arange(g)
    rel = coords[:, None] - coords[None, :] + (g - 1)  # [g, g]
    RhG = (p["rel_pos_h"][rel].astype(jnp.float32) * inv)  # [i, a, hd]
    RwG = (p["rel_pos_w"][rel].astype(jnp.float32) * inv)
    q5 = y[:, :, :C].reshape(B, g, g, H, hd).astype(jnp.float32)
    A = jnp.einsum("nijhc,iac->nijha", q5, RhG)
    Bb = jnp.einsum("nijhc,jbc->nijhb", q5, RwG)
    return (
        A.reshape(B, S, H, g).astype(y.dtype),
        Bb.reshape(B, S, H, g).astype(y.dtype),
    )


def _attn_global_fused(x: jax.Array, p: Params, cfg: SamVisionConfig) -> jax.Array:
    """Global self-attention block body on [B, g, g, C] WITHOUT the outer
    LN1 applied: returns x + proj(attn(LN1(x))) with LN1+qkv and
    proj+residual fused (int8 x int8 dots when `mlp_w8a8`).

    Reference: `/root/reference/models/segment_anything/modeling/
    image_encoder.py:163-185` (Block.forward, window_size == 0)."""
    from ullava_tpu.ops.mlp_kernel import fused_linear, fused_ln_linear

    B, g, _, C = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    S = g * g
    interp = cfg.attn_kernel == "pallas_interpret"
    # Row-chunk to 1024-token tiles so each Pallas block stays a few MB.
    xt = x.reshape(B * S // 1024, 1024, C)
    y = fused_ln_linear(
        xt, p["ln1_scale"], p["ln1_bias"],
        p["qkv"]["q"], p["qkv"]["scale"], p["qkv_bias"],
        cfg.layer_norm_eps, w8a8=cfg.mlp_w8a8, interpret=interp,
    )  # [B*S/1024, 1024, 3C]
    hg = _global_head_group(cfg)
    if hg:
        # Lane-sliced kernel: q/k/v stay inside y (no head-major staging
        # transposes), bias terms in their natural einsum layout.
        from ullava_tpu.ops.sam_attention import fused_global_attention_y

        y3 = y.reshape(B, S, 3 * C)
        A, Bb = _bias_terms_global_natural(y3, p, cfg, g)
        out = fused_global_attention_y(
            y3, A, Bb, num_heads=H, head_dim=hd, window=g, scale=hd**-0.5,
            head_group=hg, exp_bf16=cfg.mlp_w8a8,
            dots_i8=cfg.attn_dots_i8, interpret=interp,
        )  # [B, S, C]
    else:
        qkv = y.reshape(B, S, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        qh = q.transpose(0, 2, 1, 3)  # [B, H, S, hd]
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        A, Bb = decomposed_bias_terms(
            qh.reshape(B, H, g, g, hd), p["rel_pos_h"], p["rel_pos_w"], g
        )
        N = B * H
        out = fused_global_attention(
            qh.reshape(N, S, hd), kh.reshape(N, S, hd), vh.reshape(N, S, hd),
            A.reshape(N, S, g).astype(qh.dtype),
            Bb.reshape(N, S, g).astype(qh.dtype),
            window=g, scale=hd**-0.5, exp_bf16=cfg.mlp_w8a8, interpret=interp,
        )
        out = out.reshape(B, H, S, hd).transpose(0, 2, 1, 3).reshape(B, S, C)
    out = fused_linear(
        out.reshape(B * S // 1024, 1024, C),
        p["proj"]["q"], p["proj"]["scale"], p["proj_bias"],
        residual=xt, w8a8=cfg.mlp_w8a8, interpret=interp,
    )
    return out.reshape(B, g, g, C)


def _block(x: jax.Array, p: Params, cfg: SamVisionConfig, window: bool) -> jax.Array:
    """One transformer block on [B, gh, gw, C]."""
    B, gh, gw, C = x.shape
    if not window and _use_global_fused(p, cfg, gh):
        return _mlp_tail(_attn_global_fused(x, p, cfg), p, cfg)
    shortcut = x
    x = layer_norm(x, p["ln1_scale"], p["ln1_bias"], cfg.layer_norm_eps)

    if window:
        ws = cfg.window_size
        pad_h = (-gh) % ws
        pad_w = (-gw) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = gh + pad_h, gw + pad_w
        nh, nw = Hp // ws, Wp // ws
        x = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B * nh * nw, ws, ws, C)
        x = _attn(x, p, cfg, ws)
        x = x.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, Hp, Wp, C)[:, :gh, :gw]
    else:
        x = _attn(x, p, cfg, gh)

    x = shortcut + x
    return _mlp_tail(x, p, cfg)


def _mlp_tail(x: jax.Array, p: Params, cfg: SamVisionConfig) -> jax.Array:
    """x + MLP(LN2(x)) over [..., C] tokens; fused Pallas kernel
    (LN2+fc1+gelu+fc2+residual in one VMEM pass) on the serving path:
    frozen int8 towers, TPU, tile-aligned token count."""
    from ullava_tpu.ops.quant import is_quantized

    C = x.shape[-1]
    T = x.size // C
    if (
        _use_pallas(cfg, 0)
        and is_quantized(p["fc1"])
        and is_quantized(p["fc2"])
        and p["fc1"]["q"].shape[1] % 512 == 0
    ):
        from ullava_tpu.ops.mlp_kernel import fused_mlp_block

        args = (
            p["ln2_scale"], p["ln2_bias"],
            p["fc1"]["q"], p["fc1"]["scale"], p["fc1_bias"],
            p["fc2"]["q"], p["fc2"]["scale"], p["fc2_bias"],
            cfg.layer_norm_eps,
        )
        kw = dict(
            w8a8=cfg.mlp_w8a8,
            interpret=(cfg.attn_kernel == "pallas_interpret"),
        )
        # NOTE: the kernel's 3-D form (in-VMEM flatten of [N, 196, C]
        # blocks) was measured MUCH slower at B=48 (window MLP 407+67
        # reshape -> 752 ms): Mosaic's non-8-aligned sublane relayout
        # costs far more than the XLA HBM flat-reshape copy pair it
        # replaces. The flat 2-D route stays.
        if T % 512 == 0:
            out = fused_mlp_block(x.reshape(T, C), *args, **kw)
            return out.reshape(x.shape)

    y = layer_norm(x, p["ln2_scale"], p["ln2_bias"], cfg.layer_norm_eps)
    y = jax.nn.gelu(apply_linear(y, p["fc1"]) + p["fc1_bias"], approximate=False)
    return x + (apply_linear(y, p["fc2"]) + p["fc2_bias"])


# ---------------------------------------------------------------------------
# Resident window-major layout (serving): the per-block pad -> partition ->
# attend -> unpartition -> crop chain of `_block` costs two awkward
# 14-strided HBM relayouts per window layer (~125 ms per ViT-H B=16
# encode) plus 19.6% pad-token qkv/proj FLOPs. Instead, partition ONCE per
# group into COMPACT per-class tensors (full / right-edge / bottom-edge /
# corner windows — no pad tokens anywhere), run all the group's window
# blocks in that layout, and restore grid order only for the group's
# closing global block. The reference's zero-pad attention keys are exact
# analytic constants (pad qkv input is 0, so k/v = qkv bias) supplied to
# `fused_window_attention_rect` as per-layer tables.
# Reference chain: `image_encoder.py:263-318` (window_partition/unpartition).
# ---------------------------------------------------------------------------


def _class_geometry(name: str, cfg: SamVisionConfig) -> Tuple[int, int]:
    ws, rem = cfg.window_size, cfg.grid % cfg.window_size
    return {
        "full": (ws, ws), "right": (ws, rem),
        "bottom": (rem, ws), "corner": (rem, rem),
    }[name]


def _partition_resident(
    x: jax.Array, ws: int, pad_full_to: int = 0
) -> Dict[str, jax.Array]:
    """[B, g, g, C] -> compact window-major class tensors [N, T, C].

    `pad_full_to` (serving): zero-pad the full class's token dim to a
    tile-aligned row count (196 -> 200 for ViT-H) so every downstream
    flat reshape is a free bitcast instead of a sublane-relayout HBM copy
    pair (~67 ms per B=48 encode). Pad rows are masked as attention keys
    and dropped at unpartition."""
    B, g, _, C = x.shape
    f, rem = divmod(g, ws)
    e = f * ws
    full = (
        x[:, :e, :e]
        .reshape(B, f, ws, f, ws, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B * f * f, ws * ws, C)
    )
    if pad_full_to and pad_full_to > ws * ws:
        full = jnp.pad(
            full, ((0, 0), (0, pad_full_to - ws * ws), (0, 0))
        )
    out = {"full": full}
    if rem:
        out["right"] = x[:, :e, e:].reshape(B * f, ws * rem, C)
        out["bottom"] = (
            x[:, e:, :e]
            .reshape(B, rem, f, ws, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(B * f, rem * ws, C)
        )
        out["corner"] = x[:, e:, e:].reshape(B, rem * rem, C)
    return out


def _unpartition_resident(
    cls: Dict[str, jax.Array], B: int, g: int, ws: int
) -> jax.Array:
    """Inverse of `_partition_resident` (drops any full-class pad rows)."""
    C = cls["full"].shape[-1]
    f, rem = divmod(g, ws)
    e = f * ws
    full_t = cls["full"]
    if full_t.shape[1] != ws * ws:  # padded layout: drop the pad tail
        full_t = full_t[:, : ws * ws]
    full = (
        full_t
        .reshape(B, f, f, ws, ws, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, e, e, C)
    )
    if not rem:
        return full
    right = cls["right"].reshape(B, e, rem, C)
    top = jnp.concatenate([full, right], axis=2)  # [B, e, g, C]
    bottom = (
        cls["bottom"]
        .reshape(B, f, rem, ws, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, rem, e, C)
    )
    corner = cls["corner"].reshape(B, rem, rem, C)
    bot = jnp.concatenate([bottom, corner], axis=2)  # [B, rem, g, C]
    return jnp.concatenate([top, bot], axis=1)


def _rect_onehot(rows: int, cols: int, W: int, dtype) -> jax.Array:
    """[T, 2W] reversed-column one-hots for the rect kernel's key fold."""
    t = jnp.arange(rows * cols)
    return jnp.concatenate(
        [
            (t[:, None] // cols == W - 1 - jnp.arange(W)[None]),
            (t[:, None] % cols == W - 1 - jnp.arange(W)[None]),
        ],
        axis=-1,
    ).astype(dtype)


def _pad_tables(qkv_bias, rows: int, cols: int, W: int, H: int, hd: int, dtype):
    """Virtual pad-key tables: the reference zero-pads after LN1, so a pad
    token's key/value are exactly the qkv bias slices; only the rel-pos
    one-hots vary by pad position. Returns ([H, P, hd+2W], [H, hd])."""
    import numpy as np

    bias = qkv_bias.reshape(3, H, hd)
    pads = np.array(
        [(a, b) for a in range(W) for b in range(W)
         if not (a < rows and b < cols)],
        np.int32,
    )
    P = pads.shape[0]
    oh = np.concatenate(
        [
            (pads[:, 0:1] == W - 1 - np.arange(W)[None]),
            (pads[:, 1:2] == W - 1 - np.arange(W)[None]),
        ],
        axis=-1,
    ).astype(np.float32)  # [P, 2W]
    pad_k = jnp.concatenate(
        [
            jnp.broadcast_to(bias[1][:, None, :], (H, P, hd)).astype(dtype),
            jnp.broadcast_to(jnp.asarray(oh)[None], (H, P, 2 * W)).astype(dtype),
        ],
        axis=-1,
    )
    pad_v = bias[2].astype(dtype)  # [H, hd]
    return pad_k, pad_v


def _attn_resident_cls(
    x: jax.Array, p: Params, cfg: SamVisionConfig, rows: int, cols: int
) -> jax.Array:
    """Windowed attention on one compact class tensor [N, T, C]: returns
    x + proj(attn(LN1(x))) — LN1, qkv, and the output projection are all
    fused kernels on the serving path."""
    from ullava_tpu.ops.sam_attention import (
        fused_window_attention_grid,
        fused_window_attention_rect,
    )

    W = cfg.window_size
    H, hd = cfg.num_heads, cfg.head_dim
    from ullava_tpu.ops.quant import is_quantized

    interp = cfg.attn_kernel == "pallas_interpret"
    if _use_pallas(cfg, W) and is_quantized(p["qkv"]):
        # LN1 + qkv in one kernel: kills the fp32 LN HBM passes AND the
        # batched-conv relayout of the 196-token class tensors (196 is
        # not tile-aligned, so any flat reshape is a real copy), and the
        # dot runs int8 x int8. Layout-preserving: y comes out [N, T, 3C]
        # exactly as the bias/attention kernels consume it. With
        # precomputed composite bias weights, the rel-pos bias terms ride
        # the same kernel as a second output (see
        # `precompute_window_bias_weights`).
        from ullava_tpu.ops.mlp_kernel import (
            fused_ln_linear,
            fused_ln_linear_dual,
        )

        if "biasw" in p:
            pad_rows = x.shape[1] - rows * cols  # padded full-class layout
            y, P = fused_ln_linear_dual(
                x, p["ln1_scale"], p["ln1_bias"],
                p["qkv"]["q"], p["qkv"]["scale"], p["qkv_bias"],
                p["biasw"]["q"], p["biasw"]["scale"], p["biasw_bias"],
                cfg.layer_norm_eps, w8a8=cfg.mlp_w8a8,
                rows2=rows * cols if pad_rows else 0, interpret=interp,
            )
            A, Bb = _assemble_bias_terms(
                P, rows, cols, W, cfg.num_heads, pad_rows=pad_rows
            )
        else:
            y = fused_ln_linear(
                x, p["ln1_scale"], p["ln1_bias"],
                p["qkv"]["q"], p["qkv"]["scale"], p["qkv_bias"],
                cfg.layer_norm_eps, w8a8=cfg.mlp_w8a8, interpret=interp,
            )
            A, Bb = _bias_terms_rect(
                y, p["rel_pos_h"], p["rel_pos_w"], cfg, rows, cols, W
            )
    else:
        h = layer_norm(x, p["ln1_scale"], p["ln1_bias"], cfg.layer_norm_eps)
        y = _lin(cfg, h, p["qkv"]) + p["qkv_bias"]
        A, Bb = _bias_terms_rect(
            y, p["rel_pos_h"], p["rel_pos_w"], cfg, rows, cols, W
        )
    if rows == W and cols == W:
        out = fused_window_attention_grid(
            y, A, Bb, num_heads=H, head_dim=hd, window=W,
            scale=hd**-0.5, dots_i8=cfg.attn_dots_i8,
            total_rows=y.shape[1] if y.shape[1] != W * W else 0,
            interpret=interp,
        )
    else:
        oh = _rect_onehot(rows, cols, W, y.dtype)
        pad_k, pad_v = _pad_tables(p["qkv_bias"], rows, cols, W, H, hd, y.dtype)
        out = fused_window_attention_rect(
            y, A, Bb, oh, pad_k, pad_v, num_heads=H, head_dim=hd,
            window=W, scale=hd**-0.5, dots_i8=cfg.attn_dots_i8,
            interpret=interp,
        )
    if _use_pallas(cfg, W) and is_quantized(p["proj"]):
        # Projection + residual in the layout-preserving 3-D kernel (the
        # XLA batched conv relays the non-tile-aligned class tensors).
        from ullava_tpu.ops.mlp_kernel import fused_linear

        return fused_linear(
            out, p["proj"]["q"], p["proj"]["scale"], p["proj_bias"],
            residual=x, w8a8=cfg.mlp_w8a8, interpret=interp,
        )
    return x + (_lin(cfg, out, p["proj"]) + p["proj_bias"])


def _merge_edge_classes(xs: Dict[str, jax.Array], p: Params, cfg) -> bool:
    """Serving gate for processing the right+bottom boundary classes as
    ONE token stream through qkv/proj/MLP (attention still runs per class
    — their window geometries differ). Both classes are [B*f, ws*rem, C],
    so a single leading-dim concat halves the launch count of the three
    projection kernels (~2 ms/layer at ViT-H B=48)."""
    from ullava_tpu.ops.quant import is_quantized

    return (
        "right" in xs
        and "bottom" in xs
        and xs["right"].shape == xs["bottom"].shape
        and _use_pallas(cfg, cfg.window_size)
        and is_quantized(p["qkv"])
        and is_quantized(p["proj"])
    )


def _attn_resident_edge_pair(
    xr: jax.Array, xb: jax.Array, p: Params, cfg: SamVisionConfig
) -> jax.Array:
    """Merged right+bottom boundary attention: one fused LN1+qkv call and
    one fused proj+residual call over the concatenated classes; the rect
    attention kernel runs per class on free leading-dim slices of y.
    Returns the merged post-residual stream [2*N, T, C] (caller splits
    after the shared MLP)."""
    from ullava_tpu.ops.mlp_kernel import (
        fused_linear,
        fused_ln_linear,
        fused_ln_linear_dual,
    )
    from ullava_tpu.ops.sam_attention import fused_window_attention_rect

    W = cfg.window_size
    H, hd = cfg.num_heads, cfg.head_dim
    interp = cfg.attn_kernel == "pallas_interpret"
    Nr = xr.shape[0]
    xm = jnp.concatenate([xr, xb], axis=0)
    Pm = None
    if "biasw" in p:
        ym, Pm = fused_ln_linear_dual(
            xm, p["ln1_scale"], p["ln1_bias"],
            p["qkv"]["q"], p["qkv"]["scale"], p["qkv_bias"],
            p["biasw"]["q"], p["biasw"]["scale"], p["biasw_bias"],
            cfg.layer_norm_eps, w8a8=cfg.mlp_w8a8, interpret=interp,
        )
    else:
        ym = fused_ln_linear(
            xm, p["ln1_scale"], p["ln1_bias"],
            p["qkv"]["q"], p["qkv"]["scale"], p["qkv_bias"],
            cfg.layer_norm_eps, w8a8=cfg.mlp_w8a8, interpret=interp,
        )
    if Pm is not None:
        # Dual-geometry rect launch: both halves of the merged qkv output
        # run in ONE kernel call with per-half tables routed by the block
        # index maps — the [2*N, T, 3C] -> halves split copy (~28 ms per
        # B=48 encode) never materializes.
        A_parts, B_parts, ohs, pks, pvs = [], [], [], [], []
        for idx, name in enumerate(("right", "bottom")):
            rows, cols = _class_geometry(name, cfg)
            P_half = Pm[:Nr] if idx == 0 else Pm[Nr:]
            A, Bb = _assemble_bias_terms(P_half, rows, cols, W, H)
            A_parts.append(A)
            B_parts.append(Bb)
            ohs.append(_rect_onehot(rows, cols, W, ym.dtype))
            pk, pv = _pad_tables(
                p["qkv_bias"], rows, cols, W, H, hd, ym.dtype
            )
            pks.append(pk)
            pvs.append(pv)
        om = fused_window_attention_rect(
            ym,
            jnp.concatenate(A_parts, axis=0),
            jnp.concatenate(B_parts, axis=0),
            jnp.stack(ohs), jnp.stack(pks), jnp.stack(pvs),
            num_heads=H, head_dim=hd, window=W, scale=hd**-0.5,
            dots_i8=cfg.attn_dots_i8, interpret=interp,
        )
    else:
        outs = []
        for name, y in (("right", ym[:Nr]), ("bottom", ym[Nr:])):
            rows, cols = _class_geometry(name, cfg)
            A, Bb = _bias_terms_rect(
                y, p["rel_pos_h"], p["rel_pos_w"], cfg, rows, cols, W
            )
            oh = _rect_onehot(rows, cols, W, y.dtype)
            pad_k, pad_v = _pad_tables(
                p["qkv_bias"], rows, cols, W, H, hd, y.dtype
            )
            outs.append(
                fused_window_attention_rect(
                    y, A, Bb, oh, pad_k, pad_v, num_heads=H, head_dim=hd,
                    window=W, scale=hd**-0.5, dots_i8=cfg.attn_dots_i8,
                    interpret=interp,
                )
            )
        om = jnp.concatenate(outs, axis=0)
    return fused_linear(
        om, p["proj"]["q"], p["proj"]["scale"], p["proj_bias"],
        residual=xm, w8a8=cfg.mlp_w8a8, interpret=interp,
    )


def _block_resident(
    xs: Dict[str, jax.Array], p: Params, cfg: SamVisionConfig
) -> Dict[str, jax.Array]:
    """One window-attention transformer block on the resident class dict."""
    out = {}
    merged = _merge_edge_classes(xs, p, cfg)
    for name, x in xs.items():
        if merged and name in ("right", "bottom"):
            continue
        rows, cols = _class_geometry(name, cfg)
        # LN1 + qkv + proj + residual all happen inside (fused kernels
        # on the serving path).
        h = _attn_resident_cls(x, p, cfg, rows, cols)
        out[name] = _mlp_tail(h, p, cfg)
    if merged:
        hm = _attn_resident_edge_pair(xs["right"], xs["bottom"], p, cfg)
        hm = _mlp_tail(hm, p, cfg)
        Nr = xs["right"].shape[0]
        out["right"], out["bottom"] = hm[:Nr], hm[Nr:]
    return out


def _use_resident(cfg: SamVisionConfig, wparams: Params) -> bool:
    if cfg.window_layout == "block" or _is_packed(wparams, cfg):
        return False
    if cfg.grid // cfg.window_size == 0:
        return False
    if cfg.window_layout == "resident":
        return True
    return _use_pallas(cfg, cfg.window_size)


def encode(
    params: Params, cfg: SamVisionConfig, pixel_values: jax.Array
) -> jax.Array:
    """[B, img, img, 3] (SAM-normalized, padded) -> [B, grid, grid, out_chans]."""
    cfg.validate_grouping()
    B = pixel_values.shape[0]
    g, C, P = cfg.grid, cfg.embed_dim, cfg.patch_size

    x = pixel_values.astype(cfg.dtype)
    x = x.reshape(B, g, P, g, P, 3).transpose(0, 1, 3, 5, 2, 4).reshape(B, g * g, 3 * P * P)
    x = (apply_linear(x, params["patch_proj"]) + params["patch_bias"]).reshape(B, g, g, C)
    x = x + params["pos_embed"][None]

    G, per = cfg.num_groups, cfg.group_period - 1
    wb = jax.tree_util.tree_map(
        lambda a: a.reshape((G, per) + a.shape[1:]), params["window_blocks"]
    )

    resident = _use_resident(cfg, params["window_blocks"])
    # Padded full-class layout (tile-aligned rows): only on the composite
    # serving path, where the dual LN+qkv kernel emits bias terms at the
    # real row count and the grid kernel masks the pad keys.
    ws2 = cfg.window_size * cfg.window_size
    pad_full_to = (
        -(-ws2 // 8) * 8
        if resident and ws2 % 8 and "biasw" in params["window_blocks"]
        else 0
    )

    def group_body(h, xs):
        wparams, gparams = xs

        if resident:
            cls = _partition_resident(h, cfg.window_size, pad_full_to)

            def win_body(hh, wp):
                return _block_resident(hh, wp, cfg), None

            cls, _ = jax.lax.scan(win_body, cls, wparams)
            h = _unpartition_resident(cls, B, g, cfg.window_size)
        else:

            def win_body(hh, wp):
                return _block(hh, wp, cfg, window=True), None

            h, _ = jax.lax.scan(win_body, h, wparams)
        h = _block(h, gparams, cfg, window=False)
        return h, None

    x, _ = jax.lax.scan(group_body, x, (wb, params["global_blocks"]))

    # Neck: 1x1 conv (matmul) -> LN -> 3x3 conv -> LN, fp32 statistics.
    x = x @ params["neck_conv1"]
    x = layer_norm(x, params["neck_ln1_scale"], params["neck_ln1_bias"], cfg.layer_norm_eps)
    x = jax.lax.conv_general_dilated(
        x, params["neck_conv2"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = layer_norm(x, params["neck_ln2_scale"], params["neck_ln2_bias"], cfg.layer_norm_eps)
    return x
