"""Multi-device training: mesh, sharding rules, stage-1/2 steps on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.models import llama, ullava, ullava_core
from ullava_tpu.parallel import MeshConfig, make_mesh
from ullava_tpu.parallel.sharding import (
    param_partition_specs,
    shard_batch,
    shard_params,
)
from ullava_tpu.training import optim
from ullava_tpu.training.train_step import (
    jit_step,
    make_stage1_step,
    make_stage2_step,
    make_train_state,
    shard_train_state,
)


def test_mesh_axes():
    mesh = make_mesh(MeshConfig(fsdp=2, tp=2))
    assert mesh.axis_names == ("dp", "fsdp", "tp")
    assert mesh.devices.shape == (2, 2, 2)
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(fsdp=3, tp=1))


def test_partition_specs_rules():
    cfg = ullava_core.UllavaCoreConfig.tiny()
    params = {"core": ullava_core.init_params(jax.random.PRNGKey(0), cfg)}
    mesh = make_mesh(MeshConfig(fsdp=2, tp=2))
    specs = param_partition_specs(params, mesh)
    q = specs["core"]["llm"]["layers"]["q_proj"]
    assert q == jax.sharding.PartitionSpec(None, "fsdp", "tp")
    emb = specs["core"]["llm"]["embed_tokens"]
    assert emb == jax.sharding.PartitionSpec("tp", "fsdp")
    # norms replicate
    assert specs["core"]["llm"]["norm"] == jax.sharding.PartitionSpec()


def test_indivisible_dims_fall_back_to_replication():
    mesh = make_mesh(MeshConfig(fsdp=2, tp=2))
    params = {"llm": {"layers": {"q_proj": jnp.zeros((2, 7, 6))}}}  # 7 % 2 != 0
    specs = param_partition_specs(params, mesh)
    assert specs["llm"]["layers"]["q_proj"] == jax.sharding.PartitionSpec(None, None, "tp")


def test_stage1_sharded_training_decreases_loss():
    mesh = make_mesh(MeshConfig(fsdp=2, tp=2))  # dp=2, fsdp=2, tp=2
    cfg = ullava_core.UllavaCoreConfig.tiny()
    params = {"core": ullava_core.init_params(jax.random.PRNGKey(0), cfg)}

    tx = optim.make_optimizer(1e-2)
    state, labels = make_train_state(params, tx, optim.STAGE1_PRETRAIN)
    state = shard_train_state(state, mesh, tx, labels)

    rng = np.random.default_rng(0)
    B, S = 8, 16
    ids, images = _image_batch(cfg, rng, B, S)
    batch = {
        "input_ids": ids,
        "labels": ids,
        "attn_lens": jnp.full((B,), S, jnp.int32),
        "images": images,
    }
    batch = shard_batch(batch, mesh)

    def loss_core(p, b):
        out = ullava_core.forward(
            p["core"], cfg, input_ids=b["input_ids"], labels=b["labels"],
            attn_lens=b["attn_lens"], images=b["images"],
        )
        return out["loss"], {}

    from ullava_tpu.training.train_step import _make_step

    step = jit_step(_make_step(loss_core, tx, labels))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # Params on the mesh: q_proj must be sharded across devices.
    q = state.params["core"]["llm"]["layers"]["q_proj"]
    assert len(q.sharding.device_set) == 8


def _image_batch(cfg, rng, B, S):
    P = cfg.vision.num_patches
    ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    ids[:, 1] = cfg.img_start_id
    ids[:, 2 : 2 + P] = 149
    ids[:, 2 + P] = cfg.img_end_id
    images = rng.standard_normal((B, 28, 28, 3)).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(images)


def test_stage1_freeze_policy_only_updates_projector_and_embeddings():
    mesh = make_mesh(MeshConfig())  # dp=8
    cfg = ullava_core.UllavaCoreConfig.tiny()
    params = {"core": ullava_core.init_params(jax.random.PRNGKey(1), cfg)}
    tx = optim.make_optimizer(1e-2)
    state, labels = make_train_state(params, tx, optim.STAGE1_PRETRAIN)
    state = shard_train_state(state, mesh, tx, labels)

    rng = np.random.default_rng(1)
    ids, images = _image_batch(cfg, rng, 8, 16)
    batch = shard_batch(
        {"input_ids": ids, "labels": ids,
         "attn_lens": jnp.full((8,), 16, jnp.int32), "images": images},
        mesh,
    )
    before = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    step = jit_step(make_stage1_step(cfg, tx, labels))
    batch2 = dict(batch)
    state, _ = step(state, batch2)
    after = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)

    # projector + embed updated
    assert not np.allclose(
        before["core"]["projector"]["fc0"]["w"], after["core"]["projector"]["fc0"]["w"]
    )
    assert not np.allclose(
        before["core"]["llm"]["embed_tokens"], after["core"]["llm"]["embed_tokens"]
    )
    # decoder weights and CLIP untouched
    np.testing.assert_array_equal(
        before["core"]["llm"]["layers"]["q_proj"], after["core"]["llm"]["layers"]["q_proj"]
    )
    np.testing.assert_array_equal(
        before["core"]["vision"]["patch_proj"], after["core"]["vision"]["patch_proj"]
    )


def test_stage2_sharded_step_runs():
    mesh = make_mesh(MeshConfig(fsdp=2, tp=2))
    cfg = ullava.UllavaConfig.tiny()
    params = ullava.init_params(jax.random.PRNGKey(2), cfg)
    tx = optim.make_optimizer(1e-3)
    state, labels = make_train_state(params, tx, optim.STAGE2)
    state = shard_train_state(state, mesh, tx, labels)

    rng = np.random.default_rng(2)
    B, S, F = 8, 16, cfg.mask_loss_frame
    ids = rng.integers(5, 100, size=(B, S)).astype(np.int32)
    ids[:, 5] = cfg.seg_token_idx
    ids[:, 8] = cfg.loc_token_idx
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "attn_lens": jnp.full((B,), S, jnp.int32),
        "images": jnp.asarray(rng.standard_normal((B, 28, 28, 3)), jnp.float32),
        "images_sam": jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32),
        "gt_masks": jnp.asarray((rng.random((B, 3, F, F)) > 0.5), jnp.float32),
        "mask_valid": jnp.asarray(np.tile([True, False, False], (B, 1))),
        "gt_boxes": jnp.asarray(rng.random((B, 3, 4)), jnp.float32),
        "box_valid": jnp.asarray(np.tile([True, False, False], (B, 1))),
        "input_hw": jnp.full((B, 2), 64, jnp.int32),
    }
    batch = shard_batch(batch, mesh)

    step = jit_step(make_stage2_step(cfg, tx, labels))
    state, metrics = step(state, batch)
    for k in ("loss", "ce_loss", "mask_bce_loss", "bbox_loss", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    # Frozen SAM encoder identical after the step.
    assert int(state.step) == 1


def test_lr_schedule_shapes():
    sched = optim.make_lr_schedule(1e-3, 100, warmup_ratio=0.1, schedule="linear")
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(100)) < 1e-4
    cos = optim.make_lr_schedule(1e-3, 100, schedule="cosine")
    assert float(cos(100)) < 1e-4


def test_tp_sharded_generation_matches_single_device():
    """Serving path: jitted generate over a tp=4 mesh reproduces the
    single-device greedy decode exactly."""
    from ullava_tpu.models import generate as gen_mod
    from ullava_tpu.parallel.sharding import param_shardings

    cfg = ullava_core.UllavaCoreConfig.tiny()
    params = {"core": ullava_core.init_params(jax.random.PRNGKey(5), cfg)}
    gen = gen_mod.GenerateConfig(max_new_tokens=4, temperature=0.0)

    rng = np.random.default_rng(7)
    ids = rng.integers(5, 100, size=(2, 10)).astype(np.int32)
    lens = jnp.asarray([10, 7], jnp.int32)

    ref = gen_mod.generate(
        params["core"], cfg, gen,
        input_ids=jnp.asarray(ids), prompt_lens=lens,
    )

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=4))
    sharded = shard_params(params, mesh)["core"]
    fn = gen_mod.make_generate_fn(cfg, gen)
    out = fn(sharded, jnp.asarray(ids), lens)
    np.testing.assert_array_equal(
        np.asarray(out["sequences"]), np.asarray(ref["sequences"])
    )
    np.testing.assert_array_equal(np.asarray(out["lengths"]), np.asarray(ref["lengths"]))


def test_tp_decode_body_has_no_large_collectives():
    """Regression for the round-1 SPMD 'involuntary full rematerialization'
    warning: the decode while-body must not all-gather any param-sized
    tensor (a replicate-then-repartition of lm_head/hidden every decode
    step). The only legal all-gathers are the tiny vocab-sharded argmax
    combines (one element per tp shard)."""
    import re

    from ullava_tpu.models import generate as gen_mod

    cfg = ullava_core.UllavaCoreConfig.tiny()
    params = {"core": ullava_core.init_params(jax.random.PRNGKey(5), cfg)}
    gen = gen_mod.GenerateConfig(max_new_tokens=4, temperature=0.0)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=4))
    sharded = shard_params(params, mesh)["core"]
    fn = gen_mod.make_generate_fn(cfg, gen)
    ids = jnp.asarray(
        np.random.default_rng(7).integers(5, 100, size=(2, 10)), jnp.int32
    )
    lens = jnp.asarray([10, 7], jnp.int32)
    hlo = fn.lower(sharded, ids, lens).compile().as_text()

    big = []
    for line in hlo.splitlines():
        m = re.search(r"= \w+\[([\d,]*)\][^=]* all-gather\(", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        if n > 4096:  # argmax combines are [B, tp]; param gathers are >=1e5
            big.append(line.strip()[:160])
    assert not big, f"large all-gather(s) in compiled decode:\n" + "\n".join(big)


def test_training_determinism():
    """Same seed + same data -> bitwise-identical loss trajectories
    (SURVEY §5.2: determinism is the TPU answer to race detection)."""
    cfg = ullava_core.UllavaCoreConfig.tiny()

    def run():
        params = {"core": ullava_core.init_params(jax.random.PRNGKey(0), cfg)}
        tx = optim.make_optimizer(1e-2)
        state, labels = make_train_state(params, tx, optim.STAGE1_FINETUNE)
        step = jit_step(make_stage1_step(cfg, tx, labels))
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 100, size=(2, 12)).astype(np.int32)
        batch = {
            "input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids),
            "attn_lens": jnp.full((2,), 12, jnp.int32),
        }
        losses = []
        for _ in range(3):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        return losses

    assert run() == run()


def test_opt_state_sharding_is_structural_not_shape_keyed():
    """Regression (VERDICT r1 #5): two same-SHAPE params with different
    partition specs must each get their own spec on the Adam moments.
    q_proj [L,D,H*hd] shards (fsdp, tp) on the last two dims while
    o_proj [L,H*hd,D] shards (tp, fsdp) — with D == H*hd the shapes
    collide, so a shape-keyed map would put one param's moments on the
    other's layout."""
    mesh = make_mesh(MeshConfig(fsdp=2, tp=2))
    params = {
        "llm": {
            "layers": {
                "q_proj": jnp.zeros((2, 8, 8), jnp.float32),
                "o_proj": jnp.zeros((2, 8, 8), jnp.float32),
            }
        }
    }
    specs = param_partition_specs(params, mesh)
    q_spec = specs["llm"]["layers"]["q_proj"]
    o_spec = specs["llm"]["layers"]["o_proj"]
    assert q_spec != o_spec  # the premise: same shape, different specs

    tx = optim.make_optimizer(1e-2)
    state, labels = make_train_state(params, tx, (r"^llm/",))
    state = shard_train_state(state, mesh, tx, labels)

    adam = state.opt_state[1][0]  # chain(clip, adamw) -> adamw scale_by_adam
    for moments in (adam.mu, adam.nu):
        got_q = moments["llm"]["layers"]["q_proj"].sharding.spec
        got_o = moments["llm"]["layers"]["o_proj"].sharding.spec
        assert got_q == q_spec, got_q
        assert got_o == o_spec, got_o
    # non-param state replicates
    assert adam.count.sharding.spec == jax.sharding.PartitionSpec()
