"""LLaMA decoder: numerical parity vs HF torch, KV-cache decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.models import llama
from ullava_tpu.models.weights import convert_llama, torch_module_state_dict


@pytest.fixture(scope="module")
def tiny_pair():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    sd = torch_module_state_dict(hf_model)

    cfg = llama.LlamaConfig.tiny(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=4, max_position_embeddings=128,
    )
    params = convert_llama(sd, cfg.num_layers, dtype=jnp.float32)
    return hf_model, cfg, params


def test_logits_match_hf(tiny_pair):
    torch = pytest.importorskip("torch")
    hf_model, cfg, params = tiny_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 10)).astype(np.int32)

    with torch.no_grad():
        ref = hf_model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    out = llama.forward(params, cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=2e-4, rtol=2e-4)


def test_kv_lens_masks_hf_attention_mask(tiny_pair):
    torch = pytest.importorskip("torch")
    hf_model, cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(2, 8)).astype(np.int32)
    # Right padding: sample 0 has 5 real tokens.
    mask = np.ones((2, 8), dtype=np.int64)
    mask[0, 5:] = 0

    with torch.no_grad():
        ref = hf_model(
            torch.tensor(ids, dtype=torch.long), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    out = llama.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        kv_lens=jnp.asarray([5, 8], dtype=jnp.int32),
    )
    got = np.asarray(out["logits"])
    # Only positions inside the valid prefix are comparable.
    np.testing.assert_allclose(got[0, :5], ref[0, :5], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got[1], ref[1], atol=2e-4, rtol=2e-4)


def test_cached_decode_matches_full_forward(tiny_pair):
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(2)
    B, S = 2, 12
    prompt_lens = np.array([7, 12], dtype=np.int32)
    ids = rng.integers(0, 128, size=(B, S)).astype(np.int32)

    # Full forward over each sample's true prefix.
    full = llama.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        kv_lens=jnp.asarray(prompt_lens),
    )

    # Prefill + one decode step per sample, with per-sample write positions.
    cache = llama.init_kv_cache(cfg, B, max_len=32, dtype=jnp.float32)
    pre = llama.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        kv_lens=jnp.asarray(prompt_lens), kv_cache=cache,
    )
    # Next token: take argmax at each sample's last real position.
    last_idx = prompt_lens - 1
    next_tok = np.asarray(
        jnp.argmax(pre["logits"][jnp.arange(B), last_idx], axis=-1)
    ).astype(np.int32)

    step = llama.forward(
        params, cfg,
        input_ids=jnp.asarray(next_tok[:, None]),
        positions=jnp.asarray(prompt_lens[:, None]),
        kv_lens=jnp.asarray(prompt_lens + 1),
        kv_cache=pre["kv_cache"],
        write_pos=jnp.asarray(prompt_lens),
    )

    # Reference: full forward over prompt+next for each sample.
    for b in range(B):
        seq = np.concatenate([ids[b, : prompt_lens[b]], next_tok[b : b + 1]])
        ref = llama.forward(
            params, cfg, input_ids=jnp.asarray(seq[None, :]),
        )
        np.testing.assert_allclose(
            np.asarray(step["logits"][b, 0]),
            np.asarray(ref["logits"][0, -1]),
            atol=2e-4, rtol=2e-4,
        )


def test_inputs_embeds_path(tiny_pair):
    _, cfg, params = tiny_pair
    ids = np.arange(6, dtype=np.int32)[None, :]
    via_ids = llama.forward(params, cfg, input_ids=jnp.asarray(ids))
    embeds = llama.embed(params, jnp.asarray(ids))
    via_embeds = llama.forward(params, cfg, inputs_embeds=embeds)
    np.testing.assert_allclose(
        np.asarray(via_ids["logits"]), np.asarray(via_embeds["logits"]), atol=1e-6
    )


def test_remat_matches(tiny_pair):
    _, cfg, params = tiny_pair
    import dataclasses

    cfg_remat = dataclasses.replace(cfg, remat=True)
    ids = np.arange(6, dtype=np.int32)[None, :]
    a = llama.forward(params, cfg, input_ids=jnp.asarray(ids))
    b = llama.forward(params, cfg_remat, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(a["logits"]), np.asarray(b["logits"]), atol=1e-6
    )


def test_int8_llama_close_to_fp(tiny_pair):
    """Weight-only int8 llama stays close to the fp forward (serving)."""
    from ullava_tpu.ops import quant

    _, cfg, params = tiny_pair
    ids = jnp.asarray(np.arange(10, dtype=np.int32)[None])
    ref = llama.forward(params, cfg, input_ids=ids)["logits"]

    qp = dict(params)
    qp["layers"] = quant.quantize_tree(params["layers"], quant.LLAMA_QUANT_KEYS)
    qp["lm_head"] = quant.quantize_int8(params["lm_head"])
    got = llama.forward(qp, cfg, input_ids=ids)["logits"]
    # same argmax trajectory and small logit drift
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(ref, -1)), np.asarray(jnp.argmax(got, -1))
    )
    denom = np.abs(np.asarray(ref)).mean()
    assert np.abs(np.asarray(got) - np.asarray(ref)).mean() / denom < 0.05


def test_a8_prefill_close_to_weight_only(tiny_pair):
    """W8A8 prefill (serving knob): per-row dynamic activation quant stays
    close to the weight-only-int8 forward and leaves decode (S=1) on the
    weight-only path bit-for-bit."""
    import dataclasses

    from ullava_tpu.ops import quant

    _, cfg, params = tiny_pair
    qp = dict(params)
    qp["layers"] = quant.quantize_tree(params["layers"], quant.LLAMA_QUANT_KEYS)
    qp["lm_head"] = quant.quantize_int8(params["lm_head"])

    ids = jnp.asarray(np.arange(12, dtype=np.int32)[None])
    ref = llama.forward(qp, cfg, input_ids=ids)["logits"]
    cfg_a8 = dataclasses.replace(cfg, a8_prefill=True)
    got = llama.forward(qp, cfg_a8, input_ids=ids)["logits"]
    denom = np.abs(np.asarray(ref)).mean()
    assert np.abs(np.asarray(got) - np.asarray(ref)).mean() / denom < 0.05

    # decode step (S=1, cached) is untouched by the knob
    cache = llama.init_kv_cache(cfg, 1, 16)
    pre = llama.forward(qp, cfg, input_ids=ids, kv_lens=jnp.asarray([12]), kv_cache=cache, compute_logits=False)
    step_ref = llama.forward(
        qp, cfg, input_ids=jnp.asarray([[7]]), positions=jnp.asarray([[12]]),
        kv_lens=jnp.asarray([13]), kv_cache=pre["kv_cache"], write_pos=jnp.asarray([12]),
    )["logits"]
    step_a8 = llama.forward(
        qp, cfg_a8, input_ids=jnp.asarray([[7]]), positions=jnp.asarray([[12]]),
        kv_lens=jnp.asarray([13]), kv_cache=pre["kv_cache"], write_pos=jnp.asarray([12]),
    )["logits"]
    np.testing.assert_array_equal(np.asarray(step_ref), np.asarray(step_a8))
