"""Data pipeline tests (mirrors reference test/test_generator.py:53-212):
shape contracts for all 4 train batching modes x feature types, and the
decode generator's batching/padding."""

import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.data import (
    decode_generator,
    train_generator,
    validate_length,
)
from pytorchwavenetvocoder_tpu.ops.mulaw import encode_mu_law
from pytorchwavenetvocoder_tpu.utils import write_hdf5, write_wav


def make_dataset(tmp_path, n=4, fs=16000, n_aux=28, upsampling_factor=80,
                 min_sec=0.4, max_sec=0.7, feature_type="world"):
    rng = np.random.RandomState(0)
    wav_list, feat_list = [], []
    for i in range(n):
        T = int(fs * rng.uniform(min_sec, max_sec))
        x = rng.uniform(-0.5, 0.5, T).astype(np.float32)
        n_frames = T // upsampling_factor + 1
        h = rng.randn(n_frames, n_aux).astype(np.float32)
        wav = str(tmp_path / f"utt{i}.wav")
        feat = str(tmp_path / f"utt{i}.h5")
        write_wav(wav, x, fs)
        write_hdf5(feat, "/" + feature_type, h)
        wav_list.append(wav)
        feat_list.append(feat)
    return wav_list, feat_list


def test_validate_length():
    x = np.zeros(1000)
    y = np.zeros((12, 3))
    x2, y2 = validate_length(x, y, 80)
    assert len(x2) == len(y2) * 80
    x3, y3 = validate_length(np.zeros(10), np.zeros(8))
    assert len(x3) == len(y3) == 8


@pytest.mark.parametrize("use_upsampling_layer", [True, False])
def test_train_generator_minibatch(tmp_path, use_upsampling_layer):
    uf = 80
    wav_list, feat_list = make_dataset(tmp_path, upsampling_factor=uf)
    receptive_field = 155
    batch_length = 1000
    gen = train_generator(
        wav_list, feat_list, receptive_field=receptive_field,
        batch_length=batch_length, batch_size=2,
        wav_transform=lambda x: encode_mu_law(x, 256),
        upsampling_factor=uf, use_upsampling_layer=use_upsampling_layer,
        shuffle=False, seed=0)
    for _ in range(5):
        (bx, bh), bt = next(gen)
        if use_upsampling_layer:
            # window rounded down to whole frames
            win = ((receptive_field + batch_length) // uf) * uf
            assert bx.shape == (2, win)
            assert bh.shape == (2, win // uf, 28)
        else:
            # window rf+bl, minus the dropped last sample (x_[:-1])
            assert bx.shape == (2, receptive_field + batch_length - 1)
            assert bh.shape == (2, receptive_field + batch_length - 1, 28)
        assert bt.shape == bx.shape
        assert bx.dtype == np.int32 and bt.dtype == np.int32
        assert bx.min() >= 0 and bx.max() < 256
        # teacher forcing: target is input shifted by one
        np.testing.assert_array_equal(bx[:, 1:], bt[:, :-1])


@pytest.mark.parametrize("use_upsampling_layer", [True, False])
def test_train_generator_utterance_batch(tmp_path, use_upsampling_layer):
    uf = 80
    wav_list, feat_list = make_dataset(tmp_path, upsampling_factor=uf)
    gen = train_generator(
        wav_list, feat_list, receptive_field=155, batch_length=None,
        wav_transform=lambda x: encode_mu_law(x, 256),
        upsampling_factor=uf, use_upsampling_layer=use_upsampling_layer,
        shuffle=False, seed=0)
    for _ in range(4):
        (bx, bh), bt = next(gen)
        assert bx.shape[0] == 1 and bt.shape == bx.shape
        if use_upsampling_layer:
            assert bx.shape[1] == bh.shape[1] * uf
        else:
            assert bx.shape[1] == bh.shape[1]


def test_train_generator_is_infinite_and_reshuffles(tmp_path):
    wav_list, feat_list = make_dataset(tmp_path, n=2)
    gen = train_generator(
        wav_list, feat_list, receptive_field=100, batch_length=500,
        batch_size=1, wav_transform=lambda x: encode_mu_law(x, 256),
        upsampling_factor=80, use_upsampling_layer=True, shuffle=True, seed=1)
    for _ in range(40):  # more batches than one pass provides
        (bx, _), _ = next(gen)
        assert bx.shape[0] == 1


def test_decode_generator_single(tmp_path):
    wav_list, feat_list = make_dataset(tmp_path)
    gen = decode_generator(feat_list, batch_size=1, upsampling_factor=80,
                           wav_transform=lambda x: encode_mu_law(x, 256))
    items = list(gen)
    assert len(items) == len(feat_list)
    for feat_id, (x, h, n_samples) in items:
        assert x.shape == (1, 1)
        assert x[0, 0] == 128  # encode_mu_law(0) = 128
        assert h.ndim == 3
        assert n_samples == h.shape[1] * 80 - 1


def test_decode_generator_batch_sorted_and_padded(tmp_path):
    wav_list, feat_list = make_dataset(tmp_path, n=5)
    gen = decode_generator(feat_list, batch_size=3, upsampling_factor=80,
                           wav_transform=lambda x: encode_mu_law(x, 256))
    items = list(gen)
    assert sum(len(ids) for ids, _ in items) == 5
    for ids, (x, h, n_list) in items:
        assert x.shape == (len(ids), 1)
        assert h.shape[0] == len(ids)
        # sorted ascending within batch, padded to max
        assert n_list == sorted(n_list)
        assert h.shape[1] * 80 - 1 == max(n_list)


def test_train_generator_speaker_code(tmp_path):
    """use_speaker_code appends the tiled /speaker_code columns
    (reference train.py:125-128)."""
    from pytorchwavenetvocoder_tpu.utils import write_hdf5

    wav_list, feat_list = make_dataset(tmp_path, n=2)
    for i, f in enumerate(feat_list):
        write_hdf5(f, "/speaker_code", np.asarray([float(i)], np.float32))
    gen = train_generator(
        wav_list, feat_list, receptive_field=100, batch_length=500,
        batch_size=1, wav_transform=lambda x: encode_mu_law(x, 256),
        upsampling_factor=80, use_upsampling_layer=True,
        use_speaker_code=True, shuffle=False, seed=0)
    (bx, bh), bt = next(gen)
    assert bh.shape[2] == 29  # 28 aux + 1 speaker code
    assert np.all(bh[0, :, 28] == bh[0, 0, 28])


def test_train_generator_buffer_spans_file_boundary(tmp_path):
    """The sliding window buffer concatenates across utterances: no
    samples are dropped at file boundaries (reference train.py:144-150
    keeps one cross-file buffer)."""
    uf = 80
    rng = np.random.RandomState(7)
    wav_list, feat_list = [], []
    xs = []
    for i in range(2):
        T = 400 * (i + 1)
        x = rng.uniform(-0.5, 0.5, T).astype(np.float32)
        h = rng.randn(T // uf + 1, 28).astype(np.float32)
        wav, feat = str(tmp_path / f"u{i}.wav"), str(tmp_path / f"u{i}.h5")
        write_wav(wav, x, 16000)
        write_hdf5(feat, "/world", h)
        wav_list.append(wav)
        feat_list.append(feat)
        # emulate the generator's length validation (no-upsampler mode
        # extends h to sample rate, then trims to the shorter)
        n = min(T, (T // uf + 1) * uf)
        xs.append(x[:n])
    stream = np.concatenate(xs)

    rf, bl = 100, 200
    gen = train_generator(
        wav_list, feat_list, receptive_field=rf, batch_length=bl,
        batch_size=1, wav_transform=lambda v: encode_mu_law(v, 256),
        upsampling_factor=uf, use_upsampling_layer=False,
        shuffle=False, seed=0)
    enc = encode_mu_law(stream, 256).astype(np.int32)
    for i in range(3):  # the 2nd window spans the file-0/file-1 boundary
        (bx, bh), bt = next(gen)
        start = i * bl
        np.testing.assert_array_equal(bx[0], enc[start:start + rf + bl - 1])
        np.testing.assert_array_equal(bt[0], enc[start + 1:start + rf + bl])


def test_decode_generator_without_upsampling_layer(tmp_path):
    """No-upsampler decode: features are frame-extended on the host and
    n_samples counts extended frames minus one (reference
    decode.py:83-84,108-109)."""
    wav_list, feat_list = make_dataset(tmp_path, n=2)
    gen = decode_generator(feat_list, batch_size=1, upsampling_factor=80,
                           use_upsampling_layer=False,
                           wav_transform=lambda x: encode_mu_law(x, 256))
    from pytorchwavenetvocoder_tpu.utils import read_hdf5

    for (feat_id, (x, h, n_samples)), feat in zip(gen, feat_list):
        raw = read_hdf5(feat, "/world")
        assert h.shape[1] == raw.shape[0] * 80  # extended to sample rate
        assert n_samples == h.shape[1] - 1
        # frames are replicated within each 80-sample block
        np.testing.assert_array_equal(h[0, 0], h[0, 79])


def test_train_generator_applies_feat_transform(tmp_path):
    """feat_transform (the StandardScaler in the trainer) is applied per
    window before batching."""
    wav_list, feat_list = make_dataset(tmp_path, n=2)
    shift = 5.0
    gen_raw = train_generator(
        wav_list, feat_list, receptive_field=100, batch_length=500,
        batch_size=1, wav_transform=lambda x: encode_mu_law(x, 256),
        upsampling_factor=80, use_upsampling_layer=True,
        shuffle=False, seed=0)
    gen_tf = train_generator(
        wav_list, feat_list, receptive_field=100, batch_length=500,
        batch_size=1, wav_transform=lambda x: encode_mu_law(x, 256),
        feat_transform=lambda h: h + shift,
        upsampling_factor=80, use_upsampling_layer=True,
        shuffle=False, seed=0)
    (_, bh_raw), _ = next(gen_raw)
    (_, bh_tf), _ = next(gen_tf)
    np.testing.assert_allclose(bh_tf, bh_raw + shift, rtol=1e-6)


def test_train_generator_rejects_sub_frame_batch_length(tmp_path):
    """batch_length that rounds below one frame would make the window
    shift 0 (the same batch forever) or negative (buffer corruption) —
    it must be a hard error, not a silent warning (review fix)."""
    wav_list, feat_list = make_dataset(tmp_path, n=1)
    for bl in (50, 10):
        gen = train_generator(
            wav_list, feat_list, receptive_field=1024, batch_length=bl,
            batch_size=1, upsampling_factor=80, use_upsampling_layer=True,
            shuffle=False, seed=0)
        with pytest.raises(ValueError):
            next(gen)


def test_train_generator_utterance_mode_skips_short_utterances(tmp_path):
    """An utterance shorter than the receptive field yields zero loss
    positions (NaN mean); utterance mode must skip it (review fix)."""
    wav_list, feat_list = make_dataset(tmp_path, n=3, min_sec=0.3,
                                       max_sec=0.5)
    rf = 6000  # ~0.375 s at 16 kHz: some utterances are shorter
    gen = train_generator(
        wav_list, feat_list, receptive_field=rf, batch_length=None,
        batch_size=1, wav_transform=lambda x: encode_mu_law(x, 256),
        upsampling_factor=80, use_upsampling_layer=True,
        shuffle=False, seed=0)
    for _ in range(6):  # spans >1 epoch of the 3-file corpus
        (bx, _bh), _bt = next(gen)
        assert bx.shape[1] > rf


def test_feature_transform_passes_speaker_code_through(tmp_path):
    """The stats cover only the feature dims; the speaker-code columns
    appended after must pass through unscaled instead of crashing the
    scaler broadcast (review fix; the reference had the same ordering
    bug)."""
    from pytorchwavenetvocoder_tpu.ops.scaler import (
        StandardScaler,
        feature_transform,
    )

    scaler = StandardScaler()
    scaler.mean_ = np.full(28, 2.0)
    scaler.scale_ = np.full(28, 4.0)
    tf = feature_transform(scaler)

    h = np.ones((5, 29), np.float32)
    out = tf(h)
    np.testing.assert_allclose(out[:, :28], (1.0 - 2.0) / 4.0)
    np.testing.assert_allclose(out[:, 28], 1.0)  # untouched
    # exact-width matrices keep the plain transform
    np.testing.assert_allclose(tf(np.ones((5, 28)))[:, 0], -0.25)
    with pytest.raises(ValueError):
        tf(np.ones((5, 27)))

    # end-to-end: the generator path that crashed before the fix
    wav_list, feat_list = make_dataset(tmp_path, n=2)
    for i, f in enumerate(feat_list):
        write_hdf5(f, "/speaker_code", np.asarray([float(i)], np.float32))
    gen = train_generator(
        wav_list, feat_list, receptive_field=100, batch_length=500,
        batch_size=1, wav_transform=lambda x: encode_mu_law(x, 256),
        feat_transform=tf, upsampling_factor=80, use_upsampling_layer=True,
        use_speaker_code=True, shuffle=False, seed=0)
    (bx, bh), bt = next(gen)
    assert bh.shape[2] == 29
    assert np.all(np.abs(bh[0, :, 28]) <= 1.0)  # code col not standardized


def test_train_generator_all_short_corpus_raises(tmp_path):
    """If EVERY utterance is shorter than the receptive field, utterance
    mode must raise after one fruitless epoch instead of spinning
    forever without yielding (review fix)."""
    wav_list, feat_list = make_dataset(tmp_path, n=2, min_sec=0.3,
                                       max_sec=0.4)
    gen = train_generator(
        wav_list, feat_list, receptive_field=16000, batch_length=None,
        batch_size=1, wav_transform=lambda x: encode_mu_law(x, 256),
        upsampling_factor=80, use_upsampling_layer=True,
        shuffle=False, seed=0)
    with pytest.raises(ValueError, match="receptive field"):
        next(gen)


def test_feature_transform_rejects_unexpected_extra_columns():
    """Without a speaker code (n_extra=0) a wider-than-stats feature
    matrix is a wrong-stats-file error, not a silent part-scaled pass
    (review fix: decode has no n_aux cross-check of its own)."""
    from pytorchwavenetvocoder_tpu.ops.scaler import (
        StandardScaler,
        feature_transform,
    )

    scaler = StandardScaler()
    scaler.mean_ = np.zeros(28)
    scaler.scale_ = np.ones(28)
    with pytest.raises(ValueError, match="stats"):
        feature_transform(scaler, n_extra=0)(np.ones((5, 29)))
    with pytest.raises(ValueError, match="stats"):
        feature_transform(scaler, n_extra=1)(np.ones((5, 30)))
