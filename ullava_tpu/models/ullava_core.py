"""uLLaVA stage-1 model: CLIP tower + projector + LLaMA decoder.

TPU-native redesign of `/root/reference/models/ullava_core.py:78-355`:

- `encode_image` / `encode_video`: frozen CLIP features (stop_gradient)
  at `vision_hidden_layer` with CLS dropped; videos are CLIP-encoded per
  frame then pooled temporally (mean over frames -> spatial tokens) and
  spatially (mean over patches -> temporal tokens), concatenated to
  n_frm + 256 tokens (reference `encode_video:160-180`).
- `splice_mm_features`: the reference's per-sample Python splice loop
  (`embed_images_videos:182-277`) becomes a fixed-shape vectorized merge:
  patch-token runs are located by the `<img_beg>`/`<vid_beg>` marker and
  overwritten with projected features via gather + `jnp.where`. The
  reference's NCCL-hang workaround (dummy projector pass for text-only
  batches, `:213-220`) is unnecessary: the jit graph always touches all
  params.
- pretraining detach (`projector_from_scratch`, reference `:231-240`):
  text embeddings outside the [start, end] span are `stop_gradient`ed so
  only the mm marker tokens' embedding rows train; text-only samples keep
  full embedding gradients (matching the reference branch exactly).
- `forward`: decoder + shifted CE loss with IGNORE_INDEX masking.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ullava_tpu.constants import IGNORE_INDEX
from ullava_tpu.models import clip_vit, llama, projector

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UllavaCoreConfig:
    llm: llama.LlamaConfig = dataclasses.field(default_factory=llama.LlamaConfig)
    vision: clip_vit.CLIPVisionConfig = dataclasses.field(
        default_factory=clip_vit.CLIPVisionConfig
    )
    vision_hidden_layer: int = -2  # reference configs use -2
    projector_type: str = "mlp"
    projector_from_scratch: bool = True
    # mm token ids in the tokenizer vocabulary (set after tokenizer build).
    img_start_id: int = -1
    img_end_id: int = -1
    vid_start_id: int = -1
    vid_end_id: int = -1
    n_frm: int = 8
    # Training CE: True streams the vocab (never materializes [B,S,V]
    # logits; ~3% slower single-chip but frees ~0.5 GB at 7B scale);
    # False uses the full-logit path.
    fused_ce: bool = True

    @classmethod
    def tiny(cls, **kw) -> "UllavaCoreConfig":
        defaults = dict(
            llm=llama.LlamaConfig.tiny(vocab_size=160),
            vision=clip_vit.CLIPVisionConfig.tiny(),
            img_start_id=150,
            img_end_id=151,
            vid_start_id=152,
            vid_end_id=153,
        )
        defaults.update(kw)
        return cls(**defaults)


def init_params(rng: jax.Array, cfg: UllavaCoreConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "llm": llama.init_params(k1, cfg.llm),
        "vision": clip_vit.init_params(k2, cfg.vision),
        "projector": projector.init_vision_projector(
            k3, cfg.vision.hidden_size, cfg.llm.hidden_size,
            cfg.projector_type, dtype=cfg.llm.dtype,
        ),
    }


def encode_image(params: Params, cfg: UllavaCoreConfig, images: jax.Array) -> jax.Array:
    """[B, H, W, 3] -> frozen CLIP patch features [B, P, Dv]."""
    out = clip_vit.forward(
        params["vision"], cfg.vision, images, hidden_layer=cfg.vision_hidden_layer
    )
    return jax.lax.stop_gradient(out["patch_features"])


def encode_video(params: Params, cfg: UllavaCoreConfig, videos: jax.Array) -> jax.Array:
    """[B, T, H, W, 3] -> temporal+spatial pooled features [B, T+P, Dv]."""
    B, T = videos.shape[0], videos.shape[1]
    frames = videos.reshape((B * T,) + videos.shape[2:])
    feats = encode_image(params, cfg, frames)  # [B*T, P, Dv]
    feats = feats.reshape(B, T, feats.shape[1], feats.shape[2])
    spatial = feats.mean(axis=1)  # [B, P, Dv] (mean over frames)
    temporal = feats.mean(axis=2)  # [B, T, Dv] (mean over patches)
    return jnp.concatenate([temporal, spatial], axis=1)  # [B, T+P, Dv]


def splice_mm_features(
    inputs_embeds: jax.Array,  # [B, S, D]
    input_ids: jax.Array,  # [B, S]
    feats: jax.Array,  # [B, N, D] projected mm features
    start_id: int,
    detach_text: bool,
) -> jax.Array:
    """Overwrite the N positions after each sample's marker token with
    `feats`; rows without the marker pass through unchanged."""
    B, S, D = inputs_embeds.shape
    N = feats.shape[1]

    is_start = input_ids == start_id
    has = jnp.any(is_start, axis=1)  # [B]
    start = jnp.argmax(is_start, axis=1)  # [B] (0 if absent; gated by `has`)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    rel = col - (start[:, None] + 1)
    in_span = (rel >= 0) & (rel < N) & has[:, None]

    gathered = jnp.take_along_axis(
        feats, jnp.clip(rel, 0, N - 1)[..., None], axis=1
    ).astype(inputs_embeds.dtype)

    base = inputs_embeds
    if detach_text:
        # Only the marker span [start, start+N+1] keeps embedding grads;
        # text-only rows (no marker) keep full grads.
        keep = ((col >= start[:, None]) & (col <= start[:, None] + N + 1) & has[:, None])
        keep = keep | ~has[:, None]
        base = jnp.where(keep[..., None], base, jax.lax.stop_gradient(base))

    return jnp.where(in_span[..., None], gathered, base)


def embed_multimodal(
    params: Params,
    cfg: UllavaCoreConfig,
    input_ids: jax.Array,  # [B, S]
    images: Optional[jax.Array] = None,  # [B, H, W, 3]
    videos: Optional[jax.Array] = None,  # [B, T, H, W, 3]
) -> jax.Array:
    """Token embeddings with image/video features spliced in."""
    embeds = llama.embed(params["llm"], input_ids).astype(cfg.llm.dtype)
    detach = cfg.projector_from_scratch
    if images is not None:
        feats = encode_image(params, cfg, images)
        feats = projector.apply_vision_projector(params["projector"], feats)
        embeds = splice_mm_features(embeds, input_ids, feats, cfg.img_start_id, detach)
    if videos is not None:
        feats = encode_video(params, cfg, videos)
        feats = projector.apply_vision_projector(params["projector"], feats)
        embeds = splice_mm_features(embeds, input_ids, feats, cfg.vid_start_id, detach)
    return embeds


def chunked_cross_entropy(
    hidden: jax.Array,  # [B, S, D] final post-norm hidden states
    lm_head: jax.Array,  # [D, V]
    labels: jax.Array,  # [B, S]
    num_chunks: int = 8,
) -> jax.Array:
    """Shifted next-token CE without materializing [B, S, V] logits.

    Streams the vocabulary in chunks with an online logsumexp (the same
    trick flash attention uses for its softmax); a remat'd `lax.scan`
    keeps only one [B, S, V/num_chunks] block live at a time. Saves
    ~0.5 GB at 7B scale per (8, 384) batch, buying a larger per-chip
    batch than the reference's full-logit path allows.
    """
    from ullava_tpu.ops.quant import dequantize, is_quantized

    if is_quantized(lm_head):
        lm_head = dequantize(lm_head, hidden.dtype)
    B, S, D = hidden.shape
    V = lm_head.shape[1]
    h = hidden[:, :-1]  # predict token t+1 from hidden t
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)

    pad = (-V) % num_chunks
    W = lm_head
    if pad:
        W = jnp.pad(W, ((0, 0), (0, pad)), constant_values=0)
    C = (V + pad) // num_chunks
    W_chunks = W.reshape(D, num_chunks, C).transpose(1, 0, 2)  # [n, D, C]

    neg_big = jnp.float32(-1e30)

    def body(carry, xs):
        m, s, tgt = carry
        w_c, idx = xs
        logits_c = jnp.einsum(
            "bsd,dc->bsc", h, w_c, preferred_element_type=jnp.float32
        )
        # Mask vocab padding in the final chunk.
        col = idx * C + jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
        logits_c = jnp.where(col < V, logits_c, neg_big)
        m_new = jnp.maximum(m, logits_c.max(axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.exp(
            logits_c - m_new[..., None]
        ).sum(axis=-1)
        # Accumulate the target logit when it falls in this chunk.
        rel = safe_labels - idx * C
        in_chunk = (rel >= 0) & (rel < C)
        gathered = jnp.take_along_axis(
            logits_c, jnp.clip(rel, 0, C - 1)[..., None], axis=-1
        )[..., 0]
        tgt = jnp.where(in_chunk, gathered, tgt)
        return (m_new, s, tgt), None

    init = (
        jnp.full((B, S - 1), neg_big, jnp.float32),
        jnp.zeros((B, S - 1), jnp.float32),
        jnp.zeros((B, S - 1), jnp.float32),
    )
    (m, s, tgt), _ = jax.lax.scan(
        jax.checkpoint(body), init,
        (W_chunks, jnp.arange(num_chunks, dtype=jnp.int32)),
    )
    lse = m + jnp.log(s)
    token_loss = jnp.where(valid, lse - tgt, 0.0)
    return token_loss.sum() / jnp.maximum(valid.sum(), 1)


def cross_entropy_loss(
    logits: jax.Array,  # [B, S, V] (pre-shift)
    labels: jax.Array,  # [B, S] with IGNORE_INDEX masking
) -> jax.Array:
    """Shifted next-token CE, mean over non-ignored targets (fp32)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_loss = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, token_loss, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return token_loss.sum() / denom


def forward(
    params: Params,
    cfg: UllavaCoreConfig,
    *,
    input_ids: jax.Array,
    labels: Optional[jax.Array] = None,
    images: Optional[jax.Array] = None,
    videos: Optional[jax.Array] = None,
    attn_lens: Optional[jax.Array] = None,  # [B] true lengths (right padding)
    inputs_embeds: Optional[jax.Array] = None,
    kv_cache: Optional[Dict[str, jax.Array]] = None,
    positions: Optional[jax.Array] = None,
    write_pos: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    if inputs_embeds is None:
        inputs_embeds = embed_multimodal(params, cfg, input_ids, images, videos)
    training = labels is not None
    use_fused = training and cfg.fused_ce
    out = llama.forward(
        params["llm"], cfg.llm,
        inputs_embeds=inputs_embeds,
        kv_lens=attn_lens,
        kv_cache=kv_cache,
        positions=positions,
        write_pos=write_pos,
        compute_logits=not use_fused,
    )
    if training:
        if use_fused:
            out["loss"] = chunked_cross_entropy(
                out["hidden_states"], params["llm"]["lm_head"], labels
            )
        else:
            out["loss"] = cross_entropy_loss(out["logits"], labels)
    return out
