"""Token/embedding utilities.

Parity with `/root/reference/models/tools.py:11-117`:
- vocabulary growth with mean-initialized embeddings for new special
  tokens (both input embeddings and lm_head rows) — `smart_*_resize`;
- the multimodal variant that adds patch tokens WITHOUT mean-averaging,
  then start/end tokens WITH it (`multi_modal_resize_token_embedding`);
- keyword stopping support: resolve stop strings to token ids for the
  token-level stopper in `models/generate.py` (the KeywordsStoppingCriteria
  equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _grow(matrix: jnp.ndarray, n_new: int, axis: int, mean_init: bool) -> jnp.ndarray:
    """Append n_new rows/cols; new entries = mean of existing (or zeros-ish
    scaled noise when mean_init=False — matching HF's default new-row init
    is unnecessary: reference immediately overwrites or trains them)."""
    if n_new <= 0:
        return matrix
    if mean_init:
        fill = jnp.mean(matrix.astype(jnp.float32), axis=axis, keepdims=True)
        fill = jnp.repeat(fill, n_new, axis=axis).astype(matrix.dtype)
    else:
        shape = list(matrix.shape)
        shape[axis] = n_new
        fill = (0.02 * np.random.default_rng(0).standard_normal(shape)).astype(
            np.float32
        )
        fill = jnp.asarray(fill, matrix.dtype)
    return jnp.concatenate([matrix, fill], axis=axis)


def resize_token_embeddings(
    llm_params: Dict[str, Any], new_vocab: int, mean_init: bool = True
) -> Dict[str, Any]:
    """Grow embed_tokens [V, D] and lm_head [D, V] to new_vocab."""
    V = llm_params["embed_tokens"].shape[0]
    n_new = new_vocab - V
    if n_new <= 0:
        # Embedding table already covers the tokenizer (checkpoints often
        # pad the vocab past the tokenizer size); nothing to grow.
        return dict(llm_params)
    out = dict(llm_params)
    out["embed_tokens"] = _grow(llm_params["embed_tokens"], n_new, 0, mean_init)
    out["lm_head"] = _grow(llm_params["lm_head"], n_new, 1, mean_init)
    return out


def smart_resize_token_embedding(
    new_tokens: Sequence[str], tokenizer, llm_params: Dict[str, Any]
) -> Tuple[Dict[str, Any], int]:
    """Add tokens to the tokenizer; mean-init their embeddings."""
    num_new = tokenizer.add_tokens(list(new_tokens))
    params = resize_token_embeddings(llm_params, len(tokenizer), mean_init=True)
    return params, num_new


def multi_modal_resize_token_embedding(
    mm_tokens: Dict[str, str], tokenizer, llm_params: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Patch tokens first (no averaging), then start/end tokens with
    mean-init; returns (params, name->token-id map)."""
    patches = [mm_tokens["IMG_PATCH"], mm_tokens["VID_PATCH"]]
    tokenizer.add_tokens(patches)
    params = resize_token_embeddings(llm_params, len(tokenizer), mean_init=False)

    start_end = [
        mm_tokens["IMG_START"], mm_tokens["IMG_END"],
        mm_tokens["VID_START"], mm_tokens["VID_END"],
    ]
    tokenizer.add_tokens(start_end)
    params = resize_token_embeddings(params, len(tokenizer), mean_init=True)

    ids = {k: tokenizer.convert_tokens_to_ids(v) for k, v in mm_tokens.items()}
    return params, ids


def pad_vocab_to_multiple(
    llm_params: Dict[str, Any], multiple: int = 128
) -> Tuple[Dict[str, Any], int]:
    """Zero-pad embed_tokens rows / lm_head cols up to a lane-aligned
    vocabulary (serving-side MXU alignment: the resized 32007-token tables
    tile poorly on [8, 128] registers). Returns (params, real_vocab);
    thread real_vocab into `GenerateConfig.vocab_size` so argmax/sampling
    masks the pad logits — pad ids can then never be emitted. Training
    keeps the exact vocabulary (pad columns would perturb the CE
    partition function)."""
    emb = llm_params["embed_tokens"]
    real_vocab = emb.shape[0]
    padded = ((real_vocab + multiple - 1) // multiple) * multiple
    n_new = padded - real_vocab
    if n_new == 0:
        return dict(llm_params), real_vocab
    out = dict(llm_params)
    out["embed_tokens"] = jnp.concatenate(
        [emb, jnp.zeros((n_new, emb.shape[1]), emb.dtype)], axis=0
    )
    head = llm_params["lm_head"]
    from ullava_tpu.ops.quant import is_quantized

    if is_quantized(head):
        out["lm_head"] = {
            "q": jnp.concatenate(
                [head["q"], jnp.zeros((head["q"].shape[0], n_new), head["q"].dtype)],
                axis=1,
            ),
            "scale": jnp.concatenate(
                [head["scale"],
                 jnp.ones(head["scale"].shape[:-1] + (n_new,), head["scale"].dtype)],
                axis=-1,
            ),
        }
    else:
        out["lm_head"] = jnp.concatenate(
            [head, jnp.zeros((head.shape[0], n_new), head.dtype)], axis=1
        )
    return out, real_vocab


def keyword_stop_ids(tokenizer, keywords: Sequence[str]) -> Tuple[int, ...]:
    """Keywords -> single-token ids for token-level stopping. Multi-token
    keywords stop on their final token (the practical equivalent of the
    reference's string-decode criteria for '###' / '</s>')."""
    ids: List[int] = []
    for kw in keywords:
        kid = tokenizer.convert_tokens_to_ids(kw)
        unk = getattr(tokenizer, "unk_token_id", None)
        if kid is not None and kid != unk:
            ids.append(int(kid))
            continue
        toks = tokenizer(kw)["input_ids"]
        toks = [t for t in toks if t != getattr(tokenizer, "bos_token_id", None)]
        if toks:
            ids.append(int(toks[-1]))
    eos = getattr(tokenizer, "eos_token_id", None)
    if eos is not None and eos not in ids:
        ids.append(int(eos))
    return tuple(ids)
