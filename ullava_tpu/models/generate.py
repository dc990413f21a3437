"""Autoregressive decoding with KV cache, stopping, and hidden readout.

TPU replacement for the HF `generate` path the reference relies on
(`/root/reference/models/ullava.py:350-362`, `models/tools.py:11-31`):

- static-shape `lax.while_loop` decode with per-sample early stop,
- greedy or temperature/top-p sampling (`do_sample iff temperature > 0`,
  reference `evaluate` semantics),
- token-level keyword stopping (KeywordsStoppingCriteria equivalent:
  generation stops after a stop token is emitted; the token remains in
  the sequence for host-side stripping),
- last-layer hidden-state capture for EVERY position, aligned so
  `hidden_last[b, j]` produced `sequences[b, j+1]` — the `[SEG]`/`[LOC]`
  readout contract (`models/ullava.py:364-397`), implemented without the
  reference's dependence on HF generate internals.

Right-padded ragged prompts decode natively: each sample writes its next
token at its own `lens[b]` cache slot (no left padding).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ullava_tpu.models import llama, ullava_core


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 32
    temperature: float = 0.2
    top_p: Optional[float] = None
    stop_token_ids: Tuple[int, ...] = ()  # usually (eos_id,) + keyword ids
    capture_hidden: bool = True
    # Real vocabulary size when embeddings/lm_head are padded to an
    # MXU-aligned width (multiple of 128): logits at ids >= vocab_size are
    # masked out of argmax/sampling so pad slots can never be emitted.
    vocab_size: Optional[int] = None

    @property
    def do_sample(self) -> bool:
        return self.temperature > 0


def sample_token(
    rng: jax.Array, logits: jax.Array, gen: GenerateConfig
) -> jax.Array:
    """[B, V] logits -> [B] token ids."""
    if gen.vocab_size is not None and gen.vocab_size < logits.shape[-1]:
        pad = jnp.arange(logits.shape[-1]) >= gen.vocab_size
        logits = jnp.where(pad[None, :], -jnp.inf, logits)
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / gen.temperature
    if gen.top_p is not None and gen.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumulative = jnp.cumsum(sorted_probs, axis=-1)
        # Keep tokens until cumulative prob exceeds top_p (always >= 1 token).
        cutoff_mask = (cumulative - sorted_probs) > gen.top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def generate(
    params: Dict[str, Any],
    cfg: ullava_core.UllavaCoreConfig,
    gen: GenerateConfig,
    *,
    input_ids: jax.Array,  # [B, S] right-padded prompts
    prompt_lens: jax.Array,  # [B] true prompt lengths
    images: Optional[jax.Array] = None,
    videos: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Returns:
      sequences   [B, S + max_new]  prompt + generated, right-padded with 0
      lengths     [B]               total sequence length per sample
      hidden_last [B, S + max_new, D] last-layer hidden per position
    """
    B, S = input_ids.shape
    total = S + gen.max_new_tokens
    D = cfg.llm.hidden_size
    if rng is None:
        rng = jax.random.PRNGKey(0)
    stops = jnp.asarray(gen.stop_token_ids or (-1,), dtype=jnp.int32)

    # ---- prefill ----------------------------------------------------------
    cache = llama.init_kv_cache(cfg.llm, B, total)
    embeds = ullava_core.embed_multimodal(params, cfg, input_ids, images, videos)
    pre = llama.forward(
        params["llm"], cfg.llm,
        inputs_embeds=embeds, kv_lens=prompt_lens, kv_cache=cache,
        compute_logits=False,
    )
    b_idx = jnp.arange(B)
    last_idx = prompt_lens - 1
    # Logits only at each sample's last prompt position: materializing the
    # full [B, S, V] fp32 prefill logits (~0.7 GB at B=16) costs both HBM
    # and lm_head FLOPs for positions that are never sampled.
    from ullava_tpu.ops.quant import apply_linear

    h_last = pre["hidden_states"][b_idx, last_idx]  # [B, D]
    last_logits = apply_linear(
        h_last.astype(cfg.llm.dtype), params["llm"]["lm_head"]
    ).astype(jnp.float32)
    first_tok = sample_token(rng, last_logits, gen)

    sequences = jnp.zeros((B, total), jnp.int32)
    sequences = jax.lax.dynamic_update_slice(sequences, input_ids.astype(jnp.int32), (0, 0))
    hidden = jnp.zeros((B, total, D), pre["hidden_states"].dtype)
    hidden = jax.lax.dynamic_update_slice(hidden, pre["hidden_states"], (0, 0, 0))

    state = {
        "step": jnp.int32(0),
        "tok": first_tok,  # next token to append
        "lens": prompt_lens.astype(jnp.int32),
        "done": jnp.zeros((B,), bool),
        "cache": pre["kv_cache"],
        "seq": sequences,
        "hidden": hidden,
        "rng": jax.random.split(rng)[0],
    }

    def cond(s):
        return (s["step"] < gen.max_new_tokens) & ~jnp.all(s["done"])

    def body(s):
        tok, lens, done = s["tok"], s["lens"], s["done"]
        # Append current token at each sample's position.
        write = ~done & (lens < total)
        seq = s["seq"].at[b_idx, jnp.minimum(lens, total - 1)].set(
            jnp.where(write, tok, s["seq"][b_idx, jnp.minimum(lens, total - 1)])
        )
        new_done = done | jnp.any(tok[:, None] == stops[None, :], axis=-1)
        new_lens = jnp.where(write, lens + 1, lens)

        # Decoder step at position `lens` (the appended token's position).
        out = llama.forward(
            params["llm"], cfg.llm,
            input_ids=tok[:, None],
            positions=lens[:, None],
            kv_lens=new_lens,
            kv_cache=s["cache"],
            write_pos=lens,
        )
        h_step = out["hidden_states"][:, 0]  # [B, D]
        hid = s["hidden"].at[b_idx, jnp.minimum(lens, total - 1)].set(
            jnp.where(write[:, None], h_step, s["hidden"][b_idx, jnp.minimum(lens, total - 1)])
        )
        rng_step, rng_next = jax.random.split(s["rng"])
        next_tok = sample_token(rng_step, out["logits"][:, 0], gen)
        return {
            "step": s["step"] + 1,
            "tok": next_tok,
            "lens": new_lens,
            "done": new_done,
            "cache": out["kv_cache"],
            "seq": seq,
            "hidden": hid,
            "rng": rng_next,
        }

    final = jax.lax.while_loop(cond, body, state)
    return {
        "sequences": final["seq"],
        "lengths": final["lens"],
        "hidden_last": final["hidden"],
    }


def make_generate_fn(cfg, gen: GenerateConfig):
    """jit-compiled generate closure for serving: configs are static, so
    one compilation serves any batch of the same shape. Works under a
    dp/tp mesh — sharded params + batch propagate through the decode
    loop's collectives."""
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def fn(params, input_ids, prompt_lens, images=None, videos=None, rng=None):
        return generate(
            params, cfg, gen,
            input_ids=input_ids, prompt_lens=prompt_lens,
            images=images, videos=videos, rng=rng,
        )

    return fn


def readout_token_hidden(
    sequences: jax.Array,  # [B, T]
    hidden_last: jax.Array,  # [B, T, D]
    lengths: jax.Array,  # [B]
    token_id: int,
    max_tokens: int,
) -> Tuple[jax.Array, jax.Array]:
    """Gather hidden states that PRODUCED each occurrence of `token_id`.

    A token at sequence position p was produced by hidden_last[:, p-1]
    (the reference's `output_ids[:, 1:]` shift, `models/ullava.py:368-370`).
    Returns ([B, max_tokens, D] padded gather, [B, max_tokens] validity).
    """
    B, T = sequences.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    valid = (sequences == token_id) & (pos >= 1) & (pos < lengths[:, None])

    # Stable top-k over positions: first `max_tokens` occurrences per row.
    key = jnp.where(valid, pos, T + 1)
    order = jnp.argsort(key, axis=1)[:, :max_tokens]  # earliest occurrences
    picked_valid = jnp.take_along_axis(valid, order, axis=1)
    h = jnp.take_along_axis(hidden_last, jnp.maximum(order - 1, 0)[..., None], axis=1)
    return h, picked_valid
