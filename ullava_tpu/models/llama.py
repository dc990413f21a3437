"""LLaMA decoder, TPU-native.

Replaces the HF `LlamaModel` the reference builds on
(`/root/reference/models/ullava_core.py:78-143`): same architecture
(RMSNorm -> rotary MHA -> RMSNorm -> SwiGLU, pre-norm residual), but
implemented as a pure function over a parameter pytree with

- `lax.scan` over stacked per-layer parameters (fast compile, natural
  remat boundary),
- a static-shape KV cache with *per-sample* write positions (right-padded
  ragged batches decode without left-pad tricks),
- flash-attention dispatch on the prefill path,
- fp32 norms/softmax under bf16 params (TPU mixed-precision recipe).

Weight layout matches converted HF checkpoints (see
`ullava_tpu/models/weights.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ullava_tpu.ops.attention import attention
from ullava_tpu.ops.norms import rms_norm
from ullava_tpu.ops.quant import apply_linear
from ullava_tpu.ops.rope import apply_rotary, rope_cos_sin

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    remat: bool = True
    # 'full' recomputes everything in backward (min memory);
    # 'dots' saves matmul outputs (no MXU recompute, ~4/3 fewer FLOPs,
    # more activation memory).
    remat_policy: str = "full"
    attn_impl: str = "auto"
    # LoRA scaling (alpha / r); active only when *_lora_a/b params exist.
    lora_scale: float = 2.0
    # Serving-only: compute the rotary rotation in the weights' dtype
    # instead of fp32 (kills ~150 ms of fp32 q/k staging per 7B prefill
    # at B=32; ~1e-3 relative rounding).
    rope_f32: bool = True
    # Serving-only: run prefill matmuls (S > 1) W8A8 when the weights are
    # int8 — per-row dynamic activation quant + int8 x int8 MXU dots
    # (~1.6x bf16 rate). Decode (S == 1) stays on the weight-only path:
    # it is weight-read bound, so int8 activations buy nothing there.
    a8_prefill: bool = False
    # Serving-only: store the KV cache int8 with per-(position, head)
    # scales. Halves the decode-step KV HBM reads (the other half of the
    # weight-read roofline) and the multi-GB cache allocation; decode
    # attention then runs the fused dequantizing kernel
    # (`ops/decode_attention.py`).
    kv_quant: bool = False
    # Serving-only (rides a8_prefill): fuse the pre-norm residual add,
    # RMSNorm, and per-row int8 activation quantize into one Pallas pass
    # at both norm sites, deferring the MLP residual one layer through
    # the scan carry (`ops/norms.rms_norm_residual_quant`).
    fused_norm_quant: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, **kw) -> "LlamaConfig":
        """Small config for tests/benchmarks."""
        defaults = dict(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=4,
            max_position_embeddings=256,
            dtype=jnp.float32,
            remat=False,
        )
        defaults.update(kw)
        return cls(**defaults)


def init_params(rng: jax.Array, cfg: LlamaConfig) -> Params:
    """Random-normal init (scale 0.02), stacked over layers."""
    k = jax.random.split(rng, 12)
    D, F, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def w(key, shape):
        return (0.02 * jax.random.normal(key, shape, jnp.float32)).astype(cfg.dtype)

    return {
        "embed_tokens": w(k[0], (V, D)),
        "layers": {
            "input_norm": jnp.ones((L, D), cfg.dtype),
            "q_proj": w(k[1], (L, D, H * hd)),
            "k_proj": w(k[2], (L, D, Hkv * hd)),
            "v_proj": w(k[3], (L, D, Hkv * hd)),
            "o_proj": w(k[4], (L, H * hd, D)),
            "post_norm": jnp.ones((L, D), cfg.dtype),
            "gate_proj": w(k[5], (L, D, F)),
            "up_proj": w(k[6], (L, D, F)),
            "down_proj": w(k[7], (L, F, D)),
        },
        "norm": jnp.ones((D,), cfg.dtype),
        "lm_head": w(k[8], (D, V)),
    }


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=None
) -> Dict[str, jax.Array]:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if cfg.kv_quant:
        # Heads pre-merged on the minor dim ([L, B, S, H*hd]): exactly the
        # layout the fused decode kernel reads, so no per-layer lane-merge
        # relayouts exist on the decode path. Length rounds up to a sublane
        # multiple — the write-and-attend kernel emits 8-row stripes.
        max_len = (max_len + 7) // 8 * 8
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        merged = shape[:-2] + (shape[-2] * shape[-1],)
        return {
            "k": jnp.zeros(merged, jnp.int8),
            "v": jnp.zeros(merged, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        }
    dtype = dtype or cfg.dtype
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _layer(
    cfg: LlamaConfig,
    h: jax.Array,  # [B, S, D]
    p: Params,  # one layer's params (leading L axis already indexed away)
    cos: jax.Array,
    sin: jax.Array,
    kv_lens: Optional[jax.Array],
    cache: Optional[Dict[str, jax.Array]],  # FULL stacked cache [L, B, maxS, ...]
    layer_idx: Optional[jax.Array],  # [] scalar index into the stacked cache
    write_pos: Optional[jax.Array],  # [B] per-sample write index
    causal: bool,
    attn_impl: str,
    pending: Optional[jax.Array] = None,  # deferred MLP residual (fused-norm serving)
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]], Optional[jax.Array]]:
    B, S, D = h.shape
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    from ullava_tpu.ops.quant import (
        apply_linear_a8,
        apply_linear_a8_prequant,
        is_quantized,
    )

    def lin(xin, w):
        if cfg.a8_prefill and S > 1 and is_quantized(w):
            return apply_linear_a8(xin, w)
        return apply_linear(xin, w)

    # Fused-norm W8A8 serving prefill (`pending is not None`, see
    # `_use_fused_norm_quant`): the previous layer's MLP residual add, the
    # RMSNorm, and the per-row int8 activation quantize run as ONE Pallas
    # pass — the XLA chain costs three full HBM round trips of the
    # [B*S, D] stream per norm site (~1.4 ms/layer at 7B B=48 prefill).
    if pending is not None:
        from ullava_tpu.ops.norms import rms_norm_residual_quant

        h, xq, xs = rms_norm_residual_quant(
            h, pending, p["input_norm"], cfg.rms_norm_eps
        )

        def proj(name, heads):
            y = apply_linear_a8_prequant(
                xq.reshape(B * S, D), xs, p[name], cfg.dtype
            )
            return y.reshape(B, S, heads, hd)
    else:
        x = rms_norm(h, p["input_norm"], cfg.rms_norm_eps)

        def proj(name, heads):
            y = lin(x, p[name])
            if f"{name}_lora_a" in p:
                # LoRA (r=8, alpha=16 reference defaults): W + scale * A @ B.
                y = y + cfg.lora_scale * ((x @ p[f"{name}_lora_a"]) @ p[f"{name}_lora_b"])
            return y.reshape(B, S, heads, hd)

    q = proj("q_proj", H)
    k = proj("k_proj", Hkv)
    v = proj("v_proj", Hkv)
    if (
        cache is not None and S > 1 and _on_tpu() and hd % 2 == 0
        # Mosaic block legality: row blocks must divide into multiples of
        # 8 (or equal R) and the lane dim should be tile-aligned. Serving
        # shapes satisfy both; tiny/toy shapes fall back to apply_rotary.
        and (B * S) % 8 == 0 and (Hkv * hd) % 128 == 0
    ):
        # Serving prefill: one-pass fused rotary (fp32 in VMEM, bf16
        # traffic). The XLA rotate_half chain costs ~5 HBM round trips of
        # q/k per layer (~177 ms per B=48 7B prefill, traced); this is
        # one. Forward-only (no VJP) — the training path keeps
        # apply_rotary.
        from ullava_tpu.ops.rope import fused_rotary

        cos_r = jnp.broadcast_to(cos, (B, S, hd)).reshape(B * S, hd)
        sin_r = jnp.broadcast_to(sin, (B, S, hd)).reshape(B * S, hd)
        q = fused_rotary(
            q.reshape(B * S, H * hd), cos_r, sin_r, hd
        ).reshape(B, S, H, hd)
        k = fused_rotary(
            k.reshape(B * S, Hkv * hd), cos_r, sin_r, hd
        ).reshape(B, S, Hkv, hd)
    else:
        q, k = apply_rotary(
            q, k, cos, sin,
            compute_dtype=None if cfg.rope_f32 else cfg.dtype,
        )

    if cache is not None:
        # The FULL stacked cache is threaded through the layer scan as a
        # carry (not xs->ys): XLA aliases carry buffers in place, so a
        # decode step writes only the B scattered rows instead of copying
        # the whole multi-GB cache once per step (round-1 decode was ~2.5x
        # off its HBM roofline exactly because of those copies).
        quant_cache = "k_scale" in cache
        if S == 1:
            b_idx = jnp.arange(B)
            cache = dict(cache)
            if quant_cache:
                from ullava_tpu.ops.decode_attention import (
                    decode_attention_int8_fused_write,
                    decode_attention_int8_xla,
                    quantize_kv_rows,
                )

                kq, ks = quantize_kv_rows(k[:, 0])  # [B, Hkv, hd] rows
                vq, vs = quantize_kv_rows(v[:, 0])
                # The fused write-and-attend kernel handles GQA/MQA
                # natively (grouped-KV dots + 0/1 scale-expansion dots);
                # only non-TPU backends take the XLA dequant fallback.
                fused = _on_tpu()
                if fused:
                    # Write-and-attend: the new row reaches HBM through the
                    # kernel's aliased output windows — no XLA scatters, one
                    # cache pass per step (round-2's separate quantize-scatter
                    # + attend cost ~14 ms/step extra at 7B/B=32).
                    attn, ck, cv, cks, cvs = decode_attention_int8_fused_write(
                        q, kq.reshape(B, Hkv * hd), ks,
                        vq.reshape(B, Hkv * hd), vs,
                        cache["k"], cache["v"],
                        cache["k_scale"], cache["v_scale"],
                        write_pos, layer_idx, scale=hd**-0.5,
                    )
                    cache["k"], cache["v"] = ck, cv
                    cache["k_scale"], cache["v_scale"] = cks, cvs
                else:
                    cache["k"] = cache["k"].at[layer_idx, b_idx, write_pos].set(
                        kq.reshape(B, Hkv * hd)
                    )
                    cache["v"] = cache["v"].at[layer_idx, b_idx, write_pos].set(
                        vq.reshape(B, Hkv * hd)
                    )
                    cache["k_scale"] = (
                        cache["k_scale"].at[layer_idx, b_idx, write_pos].set(ks)
                    )
                    cache["v_scale"] = (
                        cache["v_scale"].at[layer_idx, b_idx, write_pos].set(vs)
                    )
                    attn = decode_attention_int8_xla(
                        q, cache["k"], cache["v"],
                        cache["k_scale"], cache["v_scale"],
                        kv_lens, layer_idx, scale=hd**-0.5,
                    )
            else:
                cache["k"] = cache["k"].at[layer_idx, b_idx, write_pos].set(
                    k[:, 0].astype(cache["k"].dtype)
                )
                cache["v"] = cache["v"].at[layer_idx, b_idx, write_pos].set(
                    v[:, 0].astype(cache["v"].dtype)
                )
                k_all = jax.lax.dynamic_index_in_dim(
                    cache["k"], layer_idx, 0, keepdims=False
                )
                v_all = jax.lax.dynamic_index_in_dim(
                    cache["v"], layer_idx, 0, keepdims=False
                )
                attn = attention(
                    q, k_all, v_all, causal=False, kv_lens=kv_lens, impl="xla"
                )
        else:
            # Prefill: bulk-write positions [0, S) and attend causally.
            cache = dict(cache)
            if quant_cache:
                if _on_tpu() and S % 8 == 0:
                    # Fused quantize-and-write: int8 rows + scales DMA
                    # straight into the cache slab — the XLA chain's f32
                    # upcast/broadcast/divide intermediates (~670 MB each
                    # at 7B/B=32, ~90 ms/prefill) never touch HBM.
                    from ullava_tpu.ops.decode_attention import (
                        prefill_quantize_write,
                    )

                    (
                        cache["k"], cache["v"],
                        cache["k_scale"], cache["v_scale"],
                    ) = prefill_quantize_write(
                        k, v, cache["k"], cache["v"],
                        cache["k_scale"], cache["v_scale"], layer_idx,
                    )
                    writes = {}
                else:
                    from ullava_tpu.ops.decode_attention import (
                        quantize_kv_rows,
                    )

                    kq, ks = quantize_kv_rows(k)
                    vq, vs = quantize_kv_rows(v)
                    writes = {
                        "k": kq.reshape(B, S, Hkv * hd),
                        "v": vq.reshape(B, S, Hkv * hd),
                        "k_scale": ks,
                        "v_scale": vs,
                    }
            else:
                writes = {
                    "k": k.astype(cache["k"].dtype),
                    "v": v.astype(cache["v"].dtype),
                }
            for name, val in writes.items():
                idx = (layer_idx,) + (jnp.int32(0),) * (cache[name].ndim - 1)
                cache[name] = jax.lax.dynamic_update_slice(
                    cache[name], val[None], idx
                )
            attn = attention(
                q, k, v, causal=causal, kv_lens=kv_lens, impl=attn_impl
            )
    else:
        attn = attention(q, k, v, causal=causal, kv_lens=kv_lens, impl=attn_impl)

    o = lin(attn.reshape(B, S, H * hd), p["o_proj"])

    if pending is not None:
        from ullava_tpu.ops.norms import rms_norm_residual_quant

        h, xq2, xs2 = rms_norm_residual_quant(
            h, o, p["post_norm"], cfg.rms_norm_eps
        )
        g = apply_linear_a8_prequant(
            xq2.reshape(B * S, D), xs2, p["gate_proj"], cfg.dtype
        ).reshape(B, S, -1)
        u = apply_linear_a8_prequant(
            xq2.reshape(B * S, D), xs2, p["up_proj"], cfg.dtype
        ).reshape(B, S, -1)
    else:
        h = h + o
        x = rms_norm(h, p["post_norm"], cfg.rms_norm_eps)
        g = lin(x, p["gate_proj"])
        u = lin(x, p["up_proj"])
    a8_mlp = (
        cfg.a8_prefill and S > 1 and is_quantized(p["down_proj"])
        and _on_tpu() and (B * S) % 8 == 0
        # Serving only (cache present): the fused kernel has no VJP; the
        # training path keeps the XLA a8 chain, which differentiates.
        and cache is not None
    )
    if a8_mlp:
        # Fused silu*up + per-row int8 quantize in VMEM: the XLA chain
        # re-reads the [B*S, F] gated intermediate twice in f32 before
        # the down dot (~124 ms per B=48 prefill, traced).
        from ullava_tpu.ops.mlp_kernel import silu_mul_quant
        from ullava_tpu.ops.quant import apply_linear_a8_prequant as _prequant

        F = g.shape[-1]
        gq, gs = silu_mul_quant(g.reshape(B * S, F), u.reshape(B * S, F))
        y = _prequant(gq, gs, p["down_proj"], cfg.dtype).reshape(B, S, -1)
    else:
        gated = jax.nn.silu(g) * u
        y = lin(gated, p["down_proj"])
    if pending is not None:
        # Defer the MLP residual: the next layer's fused norm adds it.
        return h, cache, y
    return h + y, cache, None


def _use_fused_norm_quant(
    cfg: LlamaConfig, layers: Params, B: int, S: int
) -> bool:
    """Gate for the fused add+RMSNorm+int8-quantize serving-prefill path:
    W8A8 prefill on TPU, quantized q/gate/up weights, no LoRA adapters
    (LoRA needs the bf16 normed activations), tile-aligned rows/lanes."""
    from ullava_tpu.ops.quant import is_quantized

    return (
        cfg.fused_norm_quant
        and cfg.a8_prefill
        and S > 1
        and _on_tpu()
        and is_quantized(layers.get("q_proj"))
        and is_quantized(layers.get("gate_proj"))
        and is_quantized(layers.get("up_proj"))
        and "q_proj_lora_a" not in layers
        and "v_proj_lora_a" not in layers
        and (B * S) % 8 == 0
        and cfg.hidden_size % 128 == 0
    )


def forward(
    params: Params,
    cfg: LlamaConfig,
    *,
    input_ids: Optional[jax.Array] = None,  # [B, S] int32
    inputs_embeds: Optional[jax.Array] = None,  # [B, S, D]
    positions: Optional[jax.Array] = None,  # [B, S] int32
    kv_lens: Optional[jax.Array] = None,  # [B] valid KV lengths
    kv_cache: Optional[Dict[str, jax.Array]] = None,
    write_pos: Optional[jax.Array] = None,  # [B] cache write index (S==1)
    causal: bool = True,
    compute_logits: bool = True,
) -> Dict[str, Any]:
    """Run the decoder stack.

    Returns {"hidden_states": [B,S,D] (final, post-norm), "logits": [B,S,V]
    (None when compute_logits=False — training uses the chunked fused CE
    instead of materializing [B,S,V] fp32), "kv_cache": updated or None}.
    """
    if inputs_embeds is None:
        inputs_embeds = embed(params, input_ids)
    h = inputs_embeds.astype(cfg.dtype)
    B, S, _ = h.shape

    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    layer_params = params["layers"]

    if kv_cache is None:

        def body(carry, lp):
            out, _, _ = _layer(
                cfg, carry, lp, cos, sin, kv_lens, None, None, None,
                causal, cfg.attn_impl,
            )
            return out, None

        if cfg.remat:
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                body_fn = jax.checkpoint(body, policy=policy)
            else:
                body_fn = jax.checkpoint(body)
        else:
            body_fn = body
        h, _ = jax.lax.scan(body_fn, h, layer_params)
        new_cache = None
    else:
        n_layers = jax.tree_util.tree_leaves(layer_params)[0].shape[0]

        if _use_fused_norm_quant(cfg, layer_params, B, S):
            # Fused-norm W8A8 prefill: the MLP residual is deferred one
            # layer through the scan carry so both norm sites run the
            # one-pass add+norm+quantize kernel (see `_layer`). Layer 0's
            # pending is zeros (one extra 0-add, ~0.15 ms per prefill).
            def body(carry, xs):
                hh, cc, pend = carry
                lp, i = xs
                hh, cc, pend = _layer(
                    cfg, hh, lp, cos, sin, kv_lens, cc, i, write_pos,
                    causal, cfg.attn_impl, pending=pend,
                )
                return (hh, cc, pend), None

            (h, new_cache, pend), _ = jax.lax.scan(
                body,
                (h, kv_cache, jnp.zeros_like(h)),
                (layer_params, jnp.arange(n_layers, dtype=jnp.int32)),
            )
            h = h + pend
        else:
            def body(carry, xs):
                hh, cc = carry
                lp, i = xs
                hh, cc, _ = _layer(
                    cfg, hh, lp, cos, sin, kv_lens, cc, i, write_pos,
                    causal, cfg.attn_impl,
                )
                return (hh, cc), None

            (h, new_cache), _ = jax.lax.scan(
                body,
                (h, kv_cache),
                (layer_params, jnp.arange(n_layers, dtype=jnp.int32)),
            )

    h = rms_norm(h, params["norm"], cfg.rms_norm_eps)
    logits = (
        apply_linear(h, params["lm_head"]).astype(jnp.float32)
        if compute_logits else None
    )
    return {"hidden_states": h, "logits": logits, "kv_cache": new_cache}


def embed(params: Params, input_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed_tokens"], input_ids, axis=0)


# ---------------------------------------------------------------------------
# LoRA (reference: peft r=8 alpha=16 on q_proj,v_proj,
# `/root/reference/train_ullava.py:219-238`)
# ---------------------------------------------------------------------------


def add_lora(
    params: Params,
    cfg: LlamaConfig,
    rng: jax.Array,
    r: int = 8,
    targets: Tuple[str, ...] = ("q_proj", "v_proj"),
) -> Params:
    """Attach zero-initialized LoRA adapters (A gaussian, B zeros) to the
    stacked layer weights; forward picks them up by key presence."""
    from ullava_tpu.ops.quant import is_quantized

    layers = dict(params["layers"])
    for i, name in enumerate(targets):
        w = layers[name]  # [L, in, out] (possibly int8-quantized base)
        if is_quantized(w):
            L, din, dout = w["q"].shape
            dtype = cfg.dtype
        else:
            L, din, dout = w.shape
            dtype = w.dtype
        key = jax.random.fold_in(rng, i)
        layers[f"{name}_lora_a"] = (
            jax.random.normal(key, (L, din, r), jnp.float32) / (din**0.5)
        ).astype(dtype)
        layers[f"{name}_lora_b"] = jnp.zeros((L, r, dout), dtype)
    return {**params, "layers": layers}


def merge_lora(params: Params, cfg: LlamaConfig) -> Params:
    """Fold adapters into the base weights (serving path); strips lora keys
    like the reference's LoRA-aware save (`train_ullava.py:71-85`).
    Quantized (int8) base leaves are dequantized, folded, and requantized
    in place, so the quantize -> add_lora -> train -> merge serving chain
    works without rebuilding the bf16 stack."""
    from ullava_tpu.ops.quant import dequantize, is_quantized, quantize_int8

    layers = dict(params["layers"])
    for name in list(layers):
        if name.endswith("_lora_a"):
            base = name[: -len("_lora_a")]
            a, b = layers[name], layers[base + "_lora_b"]
            delta = cfg.lora_scale * jnp.einsum(
                "lir,lro->lio", a.astype(jnp.float32), b.astype(jnp.float32)
            )
            w = layers[base]
            if is_quantized(w):
                merged = dequantize(w, jnp.float32) + delta
                layers[base] = quantize_int8(merged)
            else:
                layers[base] = (w.astype(jnp.float32) + delta).astype(w.dtype)
            del layers[name], layers[base + "_lora_b"]
    return {**params, "layers": layers}
