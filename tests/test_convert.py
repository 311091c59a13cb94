"""Checkpoint-conversion parity tests.

When the reference implementation is present (mounted read-only at
/root/reference) and torch is importable, these tests instantiate the
actual reference PyTorch WaveNet, convert its state_dict, and assert
that this framework reproduces its forward logits and argmax generation
— the strongest fidelity check available (SURVEY.md §7 step 3).
"""

import os
import sys

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.convert import (
    config_from_torch_conf,
    params_from_torch_state_dict,
)
from pytorchwavenetvocoder_tpu.models.wavenet import (
    WaveNetConfig,
    fast_generate,
    wavenet_forward,
)

REFERENCE = "/root/reference"


def _load_reference_wavenet():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(os.path.join(REFERENCE, "wavenet_vocoder")):
        pytest.skip("reference implementation not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from wavenet_vocoder.nets import WaveNet as TorchWaveNet  # noqa: E501

    return torch, TorchWaveNet


def _build_pair(torch, TorchWaveNet, **kw):
    cfg = WaveNetConfig(compute_dtype="float64", **kw)
    torch.manual_seed(0)
    net = TorchWaveNet(
        n_quantize=cfg.n_quantize, n_aux=cfg.n_aux, n_resch=cfg.n_resch,
        n_skipch=cfg.n_skipch, dilation_depth=cfg.dilation_depth,
        dilation_repeat=cfg.dilation_repeat, kernel_size=cfg.kernel_size,
        upsampling_factor=cfg.upsampling_factor)
    net.eval()
    # randomize parameters away from default init for a stronger check
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    params = params_from_torch_state_dict(net.state_dict(), cfg)
    return cfg, net, params


@pytest.mark.parametrize("kernel_size,upsampling_factor",
                         [(2, 0), (3, 0), (2, 10)])
def test_forward_parity_vs_reference(kernel_size, upsampling_factor):
    torch, TorchWaveNet = _load_reference_wavenet()
    cfg, net, params = _build_pair(
        torch, TorchWaveNet, n_aux=8, n_resch=16, n_skipch=16,
        dilation_depth=3, dilation_repeat=2, kernel_size=kernel_size,
        upsampling_factor=upsampling_factor)

    rng = np.random.RandomState(0)
    B, T = 2, 80
    x = rng.randint(0, 256, (B, T)).astype(np.int64)
    if upsampling_factor > 0:
        h = rng.randn(B, cfg.n_aux, T // upsampling_factor).astype(np.float32)
    else:
        h = rng.randn(B, cfg.n_aux, T).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    # our layout is channels-last
    ours = np.asarray(wavenet_forward(params, cfg, x.astype(np.int32),
                                      np.transpose(h, (0, 2, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_generation_parity_vs_reference():
    torch, TorchWaveNet = _load_reference_wavenet()
    cfg, net, params = _build_pair(
        torch, TorchWaveNet, n_aux=8, n_resch=16, n_skipch=16,
        dilation_depth=3, dilation_repeat=1, kernel_size=2,
        upsampling_factor=0)

    rng = np.random.RandomState(1)
    T = cfg.receptive_field
    n = 25
    x = rng.randint(0, 256, (1, T)).astype(np.int64)
    h = rng.randn(1, cfg.n_aux, T + n).astype(np.float32)

    with torch.no_grad():
        ref = net.generate(torch.from_numpy(x), torch.from_numpy(h), n,
                           mode="argmax")
    ours = fast_generate(params, cfg, x.astype(np.int32),
                         np.transpose(h, (0, 2, 1)), n, mode="argmax")
    np.testing.assert_array_equal(np.asarray(ref, np.int64),
                                  np.asarray(ours, np.int64))


def test_config_from_torch_conf():
    conf = dict(n_quantize=256, n_aux=28, n_resch=64, n_skipch=32,
                dilation_depth=5, dilation_repeat=2, kernel_size=2,
                upsampling_factor=80, use_upsampling_layer=True)
    cfg = config_from_torch_conf(conf)
    assert cfg.n_resch == 64 and cfg.upsampling_factor == 80
    conf["use_upsampling_layer"] = False
    assert config_from_torch_conf(conf).upsampling_factor == 0


def test_convert_checkpoint_cli_and_decode(tmp_path):
    """Full migration path: reference torch checkpoint bundle ->
    convert_checkpoint CLI -> decode CLI produces wavs."""
    torch, TorchWaveNet = _load_reference_wavenet()
    import argparse

    from pytorchwavenetvocoder_tpu.bin import convert_checkpoint, decode
    from pytorchwavenetvocoder_tpu.utils import write_hdf5

    uf, n_aux = 10, 8
    net = TorchWaveNet(n_quantize=256, n_aux=n_aux, n_resch=16, n_skipch=16,
                       dilation_depth=3, dilation_repeat=1, kernel_size=2,
                       upsampling_factor=uf)
    conf = argparse.Namespace(
        n_quantize=256, n_aux=n_aux, n_resch=16, n_skipch=16,
        dilation_depth=3, dilation_repeat=1, kernel_size=2,
        upsampling_factor=uf, use_upsampling_layer=True,
        feature_type="world", use_speaker_code=False)
    refdir = tmp_path / "ref"
    refdir.mkdir()
    torch.save({"model": net.state_dict(), "iterations": 123},
               str(refdir / "checkpoint-123.pkl"))
    torch.save(conf, str(refdir / "model.conf"))

    outdir = str(tmp_path / "converted")
    convert_checkpoint.main(["--checkpoint", str(refdir / "checkpoint-123.pkl"),
                             "--config", str(refdir / "model.conf"),
                             "--outdir", outdir, "--verbose", "0"])
    assert os.path.exists(os.path.join(outdir, "checkpoint-123.pkl"))
    assert os.path.exists(os.path.join(outdir, "model.conf"))

    # stats + feats for decoding
    stats = str(tmp_path / "stats.h5")
    write_hdf5(stats, "/world/mean", np.zeros(n_aux, np.float32))
    write_hdf5(stats, "/world/scale", np.ones(n_aux, np.float32))
    featdir = tmp_path / "feats"
    featdir.mkdir()
    rng = np.random.RandomState(0)
    write_hdf5(str(featdir / "u0.h5"), "/world",
               rng.randn(12, n_aux).astype(np.float32))
    wavout = str(tmp_path / "wav")
    decode.main(["--feats", str(featdir), "--stats", stats,
                 "--checkpoint", os.path.join(outdir, "checkpoint-123.pkl"),
                 "--config", outdir, "--outdir", wavout,
                 "--batch_size", "1", "--fs", "16000",
                 "--mode", "argmax", "--verbose", "0"])
    assert os.listdir(wavout) == ["u0.wav"]


def test_torch_state_dict_round_trip_bit_exact():
    """params -> reference state_dict -> params is bit-identical, with
    and without the learned upsampler."""
    import jax

    from pytorchwavenetvocoder_tpu.convert import (
        torch_state_dict_from_params,
    )
    from pytorchwavenetvocoder_tpu.models.wavenet import init_wavenet_params

    for uf in (0, 10):
        cfg = WaveNetConfig(n_aux=8, n_resch=16, n_skipch=16,
                            dilation_depth=3, dilation_repeat=2,
                            kernel_size=3, upsampling_factor=uf)
        params = init_wavenet_params(jax.random.PRNGKey(0), cfg)
        sd = torch_state_dict_from_params(params, cfg)
        back = params_from_torch_state_dict(sd, cfg)
        flat_a, tree_a = jax.tree.flatten(params)
        flat_b, tree_b = jax.tree.flatten(back)
        assert tree_a == tree_b
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_state_dict_loads_into_reference():
    """A model 'trained' here loads into the actual reference WaveNet
    (strict key match) and reproduces our forward logits."""
    torch, TorchWaveNet = _load_reference_wavenet()
    import jax

    from pytorchwavenetvocoder_tpu.convert import (
        torch_state_dict_from_params,
    )
    from pytorchwavenetvocoder_tpu.models.wavenet import init_wavenet_params

    cfg = WaveNetConfig(n_aux=8, n_resch=16, n_skipch=16, dilation_depth=3,
                        dilation_repeat=2, kernel_size=2,
                        upsampling_factor=10, compute_dtype="float64")
    params = init_wavenet_params(jax.random.PRNGKey(2), cfg)
    sd = {k: torch.from_numpy(v.copy())
          for k, v in torch_state_dict_from_params(params, cfg).items()}

    net = TorchWaveNet(n_quantize=cfg.n_quantize, n_aux=cfg.n_aux,
                       n_resch=cfg.n_resch, n_skipch=cfg.n_skipch,
                       dilation_depth=cfg.dilation_depth,
                       dilation_repeat=cfg.dilation_repeat,
                       kernel_size=cfg.kernel_size,
                       upsampling_factor=cfg.upsampling_factor)
    assert set(sd) == set(net.state_dict())
    net.load_state_dict(sd)  # strict by default
    net.eval()

    rng = np.random.RandomState(0)
    B, T = 2, 80
    x = rng.randint(0, 256, (B, T)).astype(np.int64)
    h = rng.randn(B, cfg.n_aux, T // 10).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    ours = np.asarray(wavenet_forward(params, cfg, x.astype(np.int32),
                                      np.transpose(h, (0, 2, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_convert_checkpoint_cli_to_torch_round_trip(tmp_path):
    """Our bundle -> --direction to_torch -> reference-format files ->
    --direction to_jax recovers the identical parameters."""
    torch = pytest.importorskip("torch")
    import pickle

    import jax

    from pytorchwavenetvocoder_tpu.bin import convert_checkpoint
    from pytorchwavenetvocoder_tpu.models.wavenet import init_wavenet_params
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import save_model_conf

    cfg = WaveNetConfig(n_aux=8, n_resch=16, n_skipch=16, dilation_depth=3,
                        dilation_repeat=1, kernel_size=2,
                        upsampling_factor=10)
    params = init_wavenet_params(jax.random.PRNGKey(3), cfg)
    ours = tmp_path / "ours"
    ours.mkdir()
    with open(ours / "checkpoint-77.pkl", "wb") as f:
        pickle.dump({"model": jax.tree.map(np.asarray, params),
                     "optimizer": None, "iterations": 77}, f)
    save_model_conf(str(ours), dict(cfg.to_dict(), feature_type="world",
                                    use_upsampling_layer=True))

    exported = str(tmp_path / "torch")
    convert_checkpoint.main(["--checkpoint", str(ours / "checkpoint-77.pkl"),
                             "--config", str(ours / "model.conf"),
                             "--outdir", exported,
                             "--direction", "to_torch", "--verbose", "0"])
    ckpt = torch.load(os.path.join(exported, "checkpoint-77.pkl"),
                      map_location="cpu", weights_only=False)
    assert ckpt["iterations"] == 77
    conf = torch.load(os.path.join(exported, "model.conf"),
                      map_location="cpu", weights_only=False)
    assert conf.n_resch == 16 and conf.use_upsampling_layer
    assert conf.upsampling_factor == 10

    back = str(tmp_path / "back")
    convert_checkpoint.main(["--checkpoint",
                             os.path.join(exported, "checkpoint-77.pkl"),
                             "--config", os.path.join(exported, "model.conf"),
                             "--outdir", back, "--verbose", "0"])
    with open(os.path.join(back, "checkpoint-77.pkl"), "rb") as f:
        payload = pickle.load(f)
    assert payload["iterations"] == 77
    flat_a, tree_a = jax.tree.flatten(params)
    flat_b, tree_b = jax.tree.flatten(payload["model"])
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_optimizer_moments_round_trip_for_resume(tmp_path):
    """Adam moments survive both conversion directions: a model trained
    here exports a reference-layout {model, optimizer, iterations} the
    reference's train.py --resume can load (torch Adam load_state_dict +
    step), with each moment landing on the right parameter; converting
    back and restore_train_state grafts the identical moments onto a
    fresh optax state."""
    torch, TorchWaveNet = _load_reference_wavenet()
    import pickle

    import jax

    from pytorchwavenetvocoder_tpu.bin import convert_checkpoint
    from pytorchwavenetvocoder_tpu.convert import (
        find_adam_state,
        torch_param_key_order,
        torch_state_dict_from_params,
    )
    from pytorchwavenetvocoder_tpu.parallel import (
        create_train_state,
        make_train_step,
    )
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import (
        restore_train_state,
        save_checkpoint,
        save_model_conf,
    )

    cfg = WaveNetConfig(n_aux=6, n_resch=16, n_skipch=16, dilation_depth=3,
                        dilation_repeat=1, kernel_size=2,
                        upsampling_factor=10)
    # the key order contract underlying the optimizer index mapping:
    # reference named_parameters() order == torch_param_key_order
    ref_net = TorchWaveNet(
        n_quantize=cfg.n_quantize, n_aux=cfg.n_aux, n_resch=cfg.n_resch,
        n_skipch=cfg.n_skipch, dilation_depth=cfg.dilation_depth,
        dilation_repeat=cfg.dilation_repeat, kernel_size=cfg.kernel_size,
        upsampling_factor=cfg.upsampling_factor)
    assert [n for n, _ in ref_net.named_parameters()] == \
        torch_param_key_order(cfg)

    # train 2 steps here so the moments are non-trivial
    state = create_train_state(jax.random.PRNGKey(0), cfg, lr=1e-3)
    step = make_train_step(cfg, lr=1e-3, donate=False)
    rng = np.random.RandomState(0)
    bx = rng.randint(0, 256, (1, 201)).astype(np.int32)
    bh = rng.randn(1, 20, cfg.n_aux).astype(np.float32)
    for _ in range(2):
        state, _ = step(state, bx[:, :-1], bh, bx[:, 1:])
    adam = find_adam_state(state.opt_state)
    mu_ref = jax.tree.map(np.asarray, adam.mu)
    nu_ref = jax.tree.map(np.asarray, adam.nu)

    ours = tmp_path / "ours"
    ours.mkdir()
    save_checkpoint(str(ours), state, iterations=2)
    save_model_conf(str(ours), dict(cfg.to_dict(), feature_type="world",
                                    use_upsampling_layer=True, lr=1e-3))

    exported = str(tmp_path / "torch")
    convert_checkpoint.main(["--checkpoint", str(ours / "checkpoint-2.pkl"),
                             "--config", str(ours / "model.conf"),
                             "--outdir", exported,
                             "--direction", "to_torch", "--verbose", "0"])
    ckpt = torch.load(os.path.join(exported, "checkpoint-2.pkl"),
                      map_location="cpu", weights_only=False)
    assert set(ckpt) == {"model", "optimizer", "iterations"}

    # the reference resume path: load model + optimizer, take a step
    ref_net.load_state_dict(ckpt["model"])
    opt = torch.optim.Adam(ref_net.parameters(), lr=1e-3)
    opt.load_state_dict(ckpt["optimizer"])
    # each moment landed on its own parameter
    mu_sd = torch_state_dict_from_params(mu_ref, cfg)
    params_by_name = dict(ref_net.named_parameters())
    for i, name in enumerate(torch_param_key_order(cfg)):
        got = opt.state[params_by_name[name]]["exp_avg"].numpy()
        np.testing.assert_array_equal(got, mu_sd[name], err_msg=name)
    loss = ref_net(torch.from_numpy(bx[:, :-1].astype(np.int64)),
                   torch.from_numpy(np.transpose(bh, (0, 2, 1)))).sum()
    loss.backward()
    opt.step()  # a functioning optimizer, not just a loadable dict

    # back-convert: moments graft onto a fresh optax state bit-exactly
    back = str(tmp_path / "back")
    convert_checkpoint.main(["--checkpoint",
                             os.path.join(exported, "checkpoint-2.pkl"),
                             "--config", os.path.join(exported, "model.conf"),
                             "--outdir", back, "--verbose", "0"])
    fresh = create_train_state(jax.random.PRNGKey(7), cfg, lr=1e-3)
    restored = restore_train_state(os.path.join(back, "checkpoint-2.pkl"),
                                   fresh)
    radam = find_adam_state(restored.opt_state)
    assert int(radam.count) == 2
    for a, b in zip(jax.tree.leaves(radam.mu), jax.tree.leaves(mu_ref)):
        np.testing.assert_array_equal(np.asarray(a), b)
    for a, b in zip(jax.tree.leaves(radam.nu), jax.tree.leaves(nu_ref)):
        np.testing.assert_array_equal(np.asarray(a), b)
