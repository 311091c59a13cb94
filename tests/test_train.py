"""Training-step tests: loss decreases, checkpoint round-trip, and the
mesh-sharded data-parallel step on the 8-device virtual mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from pytorchwavenetvocoder_tpu.models.wavenet import WaveNetConfig
from pytorchwavenetvocoder_tpu.parallel import (
    create_train_state,
    find_latest_checkpoint,
    load_checkpoint,
    make_mesh,
    make_train_step,
    masked_ce_loss,
    save_checkpoint,
    shard_batch,
)
from pytorchwavenetvocoder_tpu.parallel.checkpoint import (
    load_model_conf,
    restore_train_state,
    save_model_conf,
)


def tiny_cfg():
    return WaveNetConfig(n_quantize=256, n_aux=4, n_resch=16, n_skipch=16,
                         dilation_depth=3, dilation_repeat=1, kernel_size=2,
                         upsampling_factor=0)


def make_batch(cfg, B=2, T=128, seed=0):
    rng = np.random.RandomState(seed)
    # learnable pattern: a repeating waveform
    x = np.tile(rng.randint(100, 156, (1, 16)), (B, T // 16 + 1))[:, :T + 1]
    h = rng.randn(B, T, cfg.n_aux).astype(np.float32)
    return (x[:, :-1].astype(np.int32), h, x[:, 1:].astype(np.int32))


def test_masked_ce_ignores_warmup():
    logits = jnp.zeros((1, 10, 4))
    targets = jnp.zeros((1, 10), jnp.int32)
    full = masked_ce_loss(logits, targets, 0)
    np.testing.assert_allclose(full, np.log(4), rtol=1e-6)
    # only positions >= rf count; uniform logits -> same value either way
    half = masked_ce_loss(logits, targets, 5)
    np.testing.assert_allclose(half, np.log(4), rtol=1e-6)


def test_train_step_reduces_loss():
    cfg = tiny_cfg()
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=5e-3)
    step = make_train_step(cfg, lr=5e-3, donate=False)
    bx, bh, bt = make_batch(cfg)
    losses = []
    for _ in range(30):
        state, loss = step(state, bx, bh, bt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert int(state.step) == 30


def test_train_step_on_mesh_matches_single():
    cfg = tiny_cfg()
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8
    B = 8
    bx, bh, bt = make_batch(cfg, B=B, T=64, seed=1)

    state1 = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    step1 = make_train_step(cfg, lr=1e-3, donate=False)
    state1, loss1 = step1(state1, bx, bh, bt)

    state2 = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    step2 = make_train_step(cfg, lr=1e-3, mesh=mesh)
    batch = shard_batch(mesh, (bx, bh, bt))
    state2, loss2 = step2(state2, *batch)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    p1 = jax.tree.leaves(state1.params)
    p2 = jax.tree.leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    step = make_train_step(cfg, lr=1e-3, donate=False)
    bx, bh, bt = make_batch(cfg)
    for _ in range(3):
        state, _ = step(state, bx, bh, bt)

    d = str(tmp_path)
    path = save_checkpoint(d, state, iterations=3)
    assert path.endswith("checkpoint-3.pkl")
    payload = load_checkpoint(path)
    assert payload["iterations"] == 3

    # restore into a fresh state and check training continues identically
    fresh = create_train_state(jax.random.PRNGKey(42), cfg, lr=1e-3)
    fresh = restore_train_state(path, fresh)
    s_a, loss_a = step(state, bx, bh, bt)
    s_b, loss_b = step(fresh, bx, bh, bt)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    save_checkpoint(d, state, iterations=10)
    assert find_latest_checkpoint(d).endswith("checkpoint-10.pkl")


def test_find_latest_sees_final_checkpoint(tmp_path):
    # a completed short run (iters < checkpoint_interval) only writes
    # checkpoint-final.pkl; --resume latest must find it, not restart
    cfg = tiny_cfg()
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    d = str(tmp_path)
    save_checkpoint(d, state, iterations=5, final=True)
    assert find_latest_checkpoint(d).endswith("checkpoint-final.pkl")
    # a numbered checkpoint newer than final wins
    save_checkpoint(d, state, iterations=20)
    assert find_latest_checkpoint(d).endswith("checkpoint-20.pkl")
    # ...but final wins again once it is the newest
    save_checkpoint(d, state, iterations=30, final=True)
    assert find_latest_checkpoint(d).endswith("checkpoint-final.pkl")


def test_resume_recovers_from_truncated_checkpoint(tmp_path):
    """A preemption mid-write must not break --resume latest.

    Simulates the failure VERDICT r3 flagged: a checkpoint file cut off
    mid-stream (as a non-atomic writer would leave it). find_latest must
    skip it — numbered or final — and land on the newest good one, and
    restore must succeed from that.
    """
    cfg = tiny_cfg()
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    d = str(tmp_path)
    import os
    good = save_checkpoint(d, state, iterations=100)
    # no tmp litter from the atomic write
    assert not any(f.endswith(".tmp") for f in os.listdir(d))

    # forge a truncated newer checkpoint (old non-atomic writer's corpse)
    bad = os.path.join(d, "checkpoint-200.pkl")
    with open(good, "rb") as f:
        blob = f.read()
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) // 3])

    latest = find_latest_checkpoint(d)
    assert latest == good
    fresh = create_train_state(jax.random.PRNGKey(7), cfg, lr=1e-3)
    fresh = restore_train_state(latest, fresh)
    assert int(fresh.step) == 100

    # truncated *final* checkpoint with a live sidecar is skipped too
    final = os.path.join(d, "checkpoint-final.pkl")
    with open(final, "wb") as f:
        f.write(blob[: len(blob) // 3])
    with open(final + ".iter", "w") as f:
        f.write("300")
    assert find_latest_checkpoint(d) == good


def test_model_conf_roundtrip(tmp_path):
    cfg = tiny_cfg()
    conf = dict(cfg.to_dict(), lr=1e-4, feature_type="world")
    path = save_model_conf(str(tmp_path), conf)
    loaded = load_model_conf(path)
    assert loaded["n_resch"] == 16
    assert WaveNetConfig.from_dict(loaded) == cfg
    # load by directory too
    assert load_model_conf(str(tmp_path))["lr"] == 1e-4


def test_shard_global_batch_single_process():
    """Single-process shard_global_batch must equal shard_batch."""
    from pytorchwavenetvocoder_tpu.parallel import (
        make_global_mesh,
        shard_global_batch,
    )

    mesh = make_global_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    (out,) = shard_global_batch(mesh, (x,))
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.sharding.spec == ("data",) or out.sharding.spec[0] == "data"


def test_remat_flag_produces_identical_loss():
    cfg = tiny_cfg()
    bx, bh, bt = make_batch(cfg, B=2, T=96, seed=4)
    s1 = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    s2 = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    step_plain = make_train_step(cfg, lr=1e-3, donate=False)
    step_remat = make_train_step(cfg, lr=1e-3, donate=False, remat=True)
    for _ in range(3):
        s1, l1 = step_plain(s1, bx, bh, bt)
        s2, l2 = step_remat(s2, bx, bh, bt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_bf16_intermediates_matches_f32():
    """bf16 matmul-output materialization (the bandwidth optimization the
    TPU training path defaults to) must match the f32 path closely and
    train just as well."""
    import dataclasses

    from pytorchwavenetvocoder_tpu.models.wavenet import wavenet_forward

    cfg = dataclasses.replace(tiny_cfg(), compute_dtype="bfloat16")
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=5e-3)
    bx, bh, bt = make_batch(cfg)

    y32 = np.asarray(wavenet_forward(state.params, cfg, bx, bh,
                                     bf16_intermediates=False), np.float32)
    y16 = np.asarray(wavenet_forward(state.params, cfg, bx, bh,
                                     bf16_intermediates=True), np.float32)
    # logits agree to bf16 rounding over the layer stack
    assert np.max(np.abs(y32 - y16)) < 0.15 * max(1.0, np.max(np.abs(y32)))

    step = make_train_step(cfg, lr=5e-3, donate=False,
                           bf16_intermediates=True)
    losses = []
    for _ in range(30):
        state, loss = step(state, bx, bh, bt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_mesh_fused_shardmap_matches_single(monkeypatch):
    """Fused-under-mesh runs grads in shard_map (a pallas_call is not
    partitionable by jit sharding propagation).  On the 8-device CPU
    mesh with the kernel in interpret mode, the sharded fused step must
    match the single-device fused step."""
    from pytorchwavenetvocoder_tpu.ops import train_kernel as tk
    from pytorchwavenetvocoder_tpu.parallel.mesh import make_mesh, shard_batch

    orig = tk.fused_layer_stack
    monkeypatch.setattr(
        tk, "fused_layer_stack",
        lambda p, c, s, h: orig(p, c, s, h, interpret=True))
    cfg = WaveNetConfig(n_quantize=256, n_aux=12, n_resch=128, n_skipch=128,
                        dilation_depth=3, dilation_repeat=1, kernel_size=2,
                        upsampling_factor=0, compute_dtype="bfloat16")
    B, T = 8, 1700
    rng = np.random.RandomState(3)
    bx = rng.randint(0, 256, (B, T)).astype(np.int64)
    bh = rng.randn(B, T, cfg.n_aux).astype(np.float32)

    state0 = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    single = make_train_step(cfg, lr=1e-3, donate=False, fused=True)
    _, loss_single = single(state0, bx, bh, bx)

    mesh = make_mesh(8, model_parallel=1)
    meshed = make_train_step(cfg, lr=1e-3, mesh=mesh, fused=True)
    sbx, sbh = shard_batch(mesh, (bx, bh))
    state0m = jax.device_put(
        create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    _, loss_mesh = meshed(state0m, sbx, sbh, sbx)

    np.testing.assert_allclose(float(loss_mesh), float(loss_single),
                               rtol=2e-5)


def test_fused_forced_outside_envelope_raises():
    """Explicitly forcing fused=True on a config/window outside the
    kernels' validated envelope must raise (naming the constraint), not
    silently run the kernel into its documented DMA race (the n_tiles>=4
    cadence) or an unaligned-channel failure."""
    import pytest

    # T too short: pads to < 4 tiles of 512
    cfg = WaveNetConfig(n_quantize=256, n_aux=12, n_resch=128, n_skipch=128,
                        dilation_depth=3, dilation_repeat=1, kernel_size=2,
                        upsampling_factor=0, compute_dtype="bfloat16")
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    B, T = 2, 600
    rng = np.random.RandomState(0)
    bx = rng.randint(0, 256, (B, T)).astype(np.int64)
    bh = rng.randn(B, T, cfg.n_aux).astype(np.float32)
    step = make_train_step(cfg, lr=1e-3, donate=False, fused=True)
    with pytest.raises(ValueError, match="tiles"):
        step(state, bx, bh, bx)

    # non-128-multiple channels
    cfg2 = WaveNetConfig(n_quantize=256, n_aux=12, n_resch=64, n_skipch=64,
                         dilation_depth=3, dilation_repeat=1, kernel_size=2,
                         upsampling_factor=0, compute_dtype="bfloat16")
    state2 = create_train_state(jax.random.PRNGKey(0), cfg2, lr=1e-3)
    bh2 = rng.randn(B, 2100, cfg2.n_aux).astype(np.float32)
    bx2 = rng.randint(0, 256, (B, 2100)).astype(np.int64)
    step2 = make_train_step(cfg2, lr=1e-3, donate=False, fused=True)
    with pytest.raises(ValueError, match="128"):
        step2(state2, bx2, bh2, bx2)


def test_fused_forced_on_model_axis_mesh_raises():
    """fused=True forced on a mesh with a model axis > 1 must raise: the
    fused shard_map branch pmeans gradients over 'data' only."""
    import pytest
    from pytorchwavenetvocoder_tpu.parallel.mesh import make_mesh

    cfg = WaveNetConfig(n_quantize=256, n_aux=12, n_resch=128, n_skipch=128,
                        dilation_depth=3, dilation_repeat=1, kernel_size=2,
                        upsampling_factor=0, compute_dtype="bfloat16")
    mesh = make_mesh(8, model_parallel=2)
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    rng = np.random.RandomState(0)
    bx = rng.randint(0, 256, (4, 2100)).astype(np.int64)
    bh = rng.randn(4, 2100, cfg.n_aux).astype(np.float32)
    step = make_train_step(cfg, lr=1e-3, mesh=mesh, fused=True)
    with pytest.raises(ValueError, match="model axis"):
        step(state, bx, bh, bx)


def test_masked_ce_ignores_pad_targets():
    """Negative targets mark utterance-mode length-bucket padding and
    are excluded from the mean (review fix: padding makes utterance mode
    compile a handful of shapes instead of one per utterance)."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 10, 4).astype(np.float32))
    targets = rng.randint(0, 4, (2, 10)).astype(np.int32)
    base = masked_ce_loss(logits, jnp.asarray(targets), 3)
    # pad each row with 4 extra positions of target -1 / garbage logits
    logits_p = jnp.concatenate(
        [logits, jnp.asarray(rng.randn(2, 4, 4), jnp.float32)], axis=1)
    targets_p = np.concatenate(
        [targets, np.full((2, 4), -1, np.int32)], axis=1)
    padded = masked_ce_loss(logits_p, jnp.asarray(targets_p), 3)
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-6)
    # fully-masked batch: 0, not NaN
    all_pad = masked_ce_loss(logits, jnp.full((2, 10), -1, jnp.int32), 3)
    assert float(all_pad) == 0.0


def test_utterance_bucket_padding():
    from pytorchwavenetvocoder_tpu.bin.train import (
        _length_bucket,
        _pad_utterance_batch,
    )

    assert [_length_bucket(n) for n in (1, 2, 3, 5, 6, 7, 100, 96)] == \
        [1, 2, 3, 6, 6, 8, 128, 96]
    # with upsampler: frames bucket, x/t follow at frames*uf
    bx = np.zeros((1, 50 * 8), np.int32)
    bt = np.ones((1, 50 * 8), np.int32)
    bh = np.zeros((1, 50, 3), np.float32)
    px, ph, pt = _pad_utterance_batch(bx, bh, bt, 8)
    assert ph.shape[1] == 64 and px.shape[1] == 64 * 8
    assert (pt[0, 50 * 8:] == -1).all() and (pt[0, :50 * 8] == 1).all()
    # without: sample-rate bucket
    bx = np.zeros((1, 97), np.int32)
    bh = np.zeros((1, 97, 3), np.float32)
    px, ph, pt = _pad_utterance_batch(bx, bh, np.ones((1, 97), np.int32), 0)
    assert px.shape[1] == ph.shape[1] == 128
    # already on a bucket: unchanged objects
    bx = np.zeros((1, 128), np.int32)
    out = _pad_utterance_batch(bx, np.zeros((1, 128, 3), np.float32),
                               np.zeros((1, 128), np.int32), 0)
    assert out[0] is bx


def test_train_step_model_parallel_matches_single():
    """DP x TP: a (data=2, model=4) mesh shards the layer weights'
    channel dims + Adam moments over 'model' (mesh._model_pspec) and
    must reproduce the single-device loss/params; the resident
    param shards must actually be 1/4-sized."""
    from pytorchwavenetvocoder_tpu.parallel import shard_state

    cfg = tiny_cfg()
    B = 4
    bx, bh, bt = make_batch(cfg, B=B, T=64, seed=2)

    state1 = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    step1 = make_train_step(cfg, lr=1e-3, donate=False)

    mesh = make_mesh(8, model_parallel=4)
    assert mesh.shape == {"data": 2, "model": 4}
    state2 = shard_state(
        mesh, create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3))
    # the placed layout is genuinely distributed: res.w (L, R, R) holds
    # R/4 output columns per model shard
    res_w = state2.params["res"]["w"]
    assert "model" in tuple(res_w.sharding.spec)
    local = res_w.addressable_shards[0].data.shape
    assert local[-1] == cfg.n_resch // 4
    step2 = make_train_step(cfg, lr=1e-3, mesh=mesh)
    batch = shard_batch(mesh, (bx, bh, bt))

    for seed in (3, 4):
        state1, loss1 = step1(state1, bx, bh, bt)
        state2, loss2 = step2(state2, *batch)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
        bx, bh, bt = make_batch(cfg, B=B, T=64, seed=seed)
        batch = shard_batch(mesh, (bx, bh, bt))
    # the updated state keeps the sharded layout across steps
    res_w = state2.params["res"]["w"]
    assert res_w.addressable_shards[0].data.shape[-1] == cfg.n_resch // 4
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
