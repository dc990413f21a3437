"""Stage-1 composition: multimodal splice, CE loss, generation loop."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.constants import IGNORE_INDEX
from ullava_tpu.models import generate as gen_mod
from ullava_tpu.models import llama, projector, ullava_core


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ullava_core.UllavaCoreConfig.tiny()
    params = ullava_core.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _make_image_batch(cfg, rng, B=2, S=24):
    P = cfg.vision.num_patches  # 4 for tiny (28/14)^2
    ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    # Sample 0 has an image span at position 3: <img_beg> P patches <img_end>
    ids[0, 3] = cfg.img_start_id
    ids[0, 4 : 4 + P] = 149  # patch token placeholder
    ids[0, 4 + P] = cfg.img_end_id
    images = rng.standard_normal((B, 28, 28, 3)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(images)


def test_splice_overwrites_span_only(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(0)
    ids, images = _make_image_batch(cfg, rng)
    P = cfg.vision.num_patches

    embeds = ullava_core.embed_multimodal(params, cfg, ids, images=images)
    plain = llama.embed(params["llm"], ids)

    feats = ullava_core.encode_image(params, cfg, images)
    feats = projector.apply_vision_projector(params["projector"], feats)

    # Span of sample 0 replaced by projected features.
    np.testing.assert_allclose(
        np.asarray(embeds[0, 4 : 4 + P]), np.asarray(feats[0]), atol=1e-6
    )
    # Outside the span: unchanged token embeddings.
    np.testing.assert_allclose(np.asarray(embeds[0, :4]), np.asarray(plain[0, :4]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(embeds[0, 4 + P + 1 :]), np.asarray(plain[0, 4 + P + 1 :]), atol=1e-6
    )
    # Sample 1 (no marker): fully unchanged.
    np.testing.assert_allclose(np.asarray(embeds[1]), np.asarray(plain[1]), atol=1e-6)


def test_pretrain_detach_gradient_flow(tiny_model):
    """projector_from_scratch: embed grads only inside the marker span for
    image rows; text-only rows keep full embedding grads."""
    cfg, params = tiny_model
    rng = np.random.default_rng(1)
    ids, images = _make_image_batch(cfg, rng)
    P = cfg.vision.num_patches

    def loss_fn(embed_table):
        p = {**params, "llm": {**params["llm"], "embed_tokens": embed_table}}
        e = ullava_core.embed_multimodal(p, cfg, ids, images=images)
        return jnp.sum(e.astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(params["llm"]["embed_tokens"])
    g = np.asarray(g)
    # Marker rows trained:
    assert np.abs(g[cfg.img_start_id]).sum() > 0
    assert np.abs(g[cfg.img_end_id]).sum() > 0
    # A token used ONLY outside the span in the image row and nowhere in
    # text rows should have zero grad. Craft: token 120 at position 1 of row 0.
    ids2 = np.asarray(ids).copy()
    ids2[ids2 == 120] = 5
    ids2[0, 1] = 120
    g2 = np.asarray(jax.grad(loss_fn)(params["llm"]["embed_tokens"]))

    def grad_for(ids_arr):
        def f(tbl):
            p = {**params, "llm": {**params["llm"], "embed_tokens": tbl}}
            e = ullava_core.embed_multimodal(p, cfg, jnp.asarray(ids_arr), images=images)
            return jnp.sum(e.astype(jnp.float32) ** 2)
        return np.asarray(jax.grad(f)(params["llm"]["embed_tokens"]))

    g2 = grad_for(ids2)
    assert np.abs(g2[120]).sum() == 0, "text outside span must be detached"
    # Same token in the text-only row 1 -> grads flow.
    ids3 = np.asarray(ids).copy()
    ids3[ids3 == 120] = 5
    ids3[1, 1] = 120
    g3 = grad_for(ids3)
    assert np.abs(g3[120]).sum() > 0, "text-only rows keep embedding grads"


def test_forward_ce_loss(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(2)
    ids, images = _make_image_batch(cfg, rng)
    labels = np.asarray(ids).copy()
    labels[:, :6] = IGNORE_INDEX
    out = ullava_core.forward(
        params, cfg, input_ids=ids, labels=jnp.asarray(labels), images=images
    )
    loss = float(out["loss"])
    assert np.isfinite(loss) and loss > 0
    # All-ignored labels -> zero loss, finite.
    out2 = ullava_core.forward(
        params, cfg, input_ids=ids,
        labels=jnp.full_like(labels, IGNORE_INDEX), images=images,
    )
    assert float(out2["loss"]) == 0.0


def test_greedy_generate_matches_teacher_forcing(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(3)
    B, S = 2, 10
    prompt_lens = np.array([6, 10], dtype=np.int32)
    ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    gen = gen_mod.GenerateConfig(max_new_tokens=4, temperature=0.0)

    out = gen_mod.generate(
        params, cfg, gen,
        input_ids=jnp.asarray(ids), prompt_lens=jnp.asarray(prompt_lens),
    )
    seqs, lens = np.asarray(out["sequences"]), np.asarray(out["lengths"])
    assert (lens == prompt_lens + 4).all()

    # Teacher-forced re-generation must reproduce every token greedily.
    for b in range(B):
        cur = ids[b, : prompt_lens[b]].tolist()
        for _ in range(4):
            o = llama.forward(params["llm"], cfg.llm,
                              input_ids=jnp.asarray([cur], dtype=jnp.int32))
            nxt = int(jnp.argmax(o["logits"][0, -1]))
            cur.append(nxt)
        np.testing.assert_array_equal(seqs[b, : len(cur)], cur)


def test_generate_stops_on_token(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(4)
    ids = rng.integers(5, 100, size=(1, 6)).astype(np.int32)
    base = gen_mod.generate(
        params, cfg, gen_mod.GenerateConfig(max_new_tokens=8, temperature=0.0),
        input_ids=jnp.asarray(ids), prompt_lens=jnp.asarray([6], np.int32),
    )
    first_tok = int(base["sequences"][0, 6])
    out = gen_mod.generate(
        params, cfg,
        gen_mod.GenerateConfig(max_new_tokens=8, temperature=0.0,
                               stop_token_ids=(first_tok,)),
        input_ids=jnp.asarray(ids), prompt_lens=jnp.asarray([6], np.int32),
    )
    # Stop token is kept in the sequence; nothing follows it.
    assert int(out["lengths"][0]) == 7
    assert int(out["sequences"][0, 6]) == first_tok


def test_hidden_alignment_and_readout(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(5)
    ids = rng.integers(5, 100, size=(1, 8)).astype(np.int32)
    gen = gen_mod.GenerateConfig(max_new_tokens=3, temperature=0.0)
    out = gen_mod.generate(
        params, cfg, gen,
        input_ids=jnp.asarray(ids), prompt_lens=jnp.asarray([8], np.int32),
    )
    # hidden_last[:, j] must equal the full-forward hidden state at j.
    T = int(out["lengths"][0])
    full = llama.forward(
        params["llm"], cfg.llm, input_ids=out["sequences"][:, :T]
    )
    np.testing.assert_allclose(
        np.asarray(out["hidden_last"][0, : T - 1]),
        np.asarray(full["hidden_states"][0, : T - 1]),
        atol=1e-4,
    )
    # readout: mark the token at position 9 (generated) and gather.
    tok = int(out["sequences"][0, 9])
    h, valid = gen_mod.readout_token_hidden(
        out["sequences"], out["hidden_last"], out["lengths"], tok, max_tokens=3
    )
    occurrences = [
        p for p in range(1, T) if int(out["sequences"][0, p]) == tok
    ]
    assert int(valid.sum()) == len(occurrences)
    np.testing.assert_allclose(
        np.asarray(h[0, 0]),
        np.asarray(out["hidden_last"][0, occurrences[0] - 1]),
        atol=1e-6,
    )


def test_top_p_sampling_valid(tiny_model):
    cfg, params = tiny_model
    logits = jnp.asarray(np.log(np.asarray([[0.5, 0.3, 0.15, 0.05]])), jnp.float32)
    gen = gen_mod.GenerateConfig(temperature=1.0, top_p=0.7)
    counts = np.zeros(4)
    for i in range(64):
        t = int(gen_mod.sample_token(jax.random.PRNGKey(i), logits, gen)[0])
        counts[t] += 1
    # tokens beyond the 0.7 nucleus (cum 0.5, 0.8) must never appear
    assert counts[2] == 0 and counts[3] == 0
    assert counts[0] > 0 and counts[1] > 0


def test_chunked_ce_matches_full(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(9)
    B, S = 2, 14
    ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    labels = ids.copy()
    labels[:, :5] = IGNORE_INDEX
    labels[1, 10:] = IGNORE_INDEX

    out = llama.forward(params["llm"], cfg.llm, input_ids=jnp.asarray(ids))
    full = ullava_core.cross_entropy_loss(out["logits"], jnp.asarray(labels))
    for n_chunks in (1, 3, 8):
        chunked = ullava_core.chunked_cross_entropy(
            out["hidden_states"], params["llm"]["lm_head"], jnp.asarray(labels),
            num_chunks=n_chunks,
        )
        np.testing.assert_allclose(float(chunked), float(full), rtol=2e-5)
    # gradients must match too (the point of the fused path)
    def loss_full(lm_head):
        p = {**params["llm"], "lm_head": lm_head}
        o = llama.forward(p, cfg.llm, input_ids=jnp.asarray(ids))
        return ullava_core.cross_entropy_loss(o["logits"], jnp.asarray(labels))

    def loss_chunked(lm_head):
        p = {**params["llm"], "lm_head": lm_head}
        o = llama.forward(p, cfg.llm, input_ids=jnp.asarray(ids), compute_logits=False)
        return ullava_core.chunked_cross_entropy(
            o["hidden_states"], lm_head, jnp.asarray(labels), num_chunks=4
        )

    g1 = jax.grad(loss_full)(params["llm"]["lm_head"])
    g2 = jax.grad(loss_chunked)(params["llm"]["lm_head"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)
