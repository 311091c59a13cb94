"""Utils-layer tests: hdf5 I/O, file listing, prefetch, extend_time, scaler, wav I/O."""



import numpy as np
import pytest

from pytorchwavenetvocoder_tpu.ops.scaler import StandardScaler
from pytorchwavenetvocoder_tpu.utils import (
    BackgroundGenerator,
    background,
    check_hdf5,
    extend_time,
    find_files,
    read_hdf5,
    read_txt,
    read_wav,
    shape_hdf5,
    write_hdf5,
    write_wav,
)


def test_hdf5_roundtrip(tmp_path):
    name = str(tmp_path / "a.h5")
    data = np.random.randn(13, 7).astype(np.float32)
    write_hdf5(name, "/world", data)
    assert check_hdf5(name, "/world")
    assert not check_hdf5(name, "/melspc")
    np.testing.assert_array_equal(read_hdf5(name, "/world"), data)
    assert shape_hdf5(name, "/world") == (13, 7)


def test_hdf5_overwrite(tmp_path):
    name = str(tmp_path / "a.h5")
    write_hdf5(name, "/x", np.zeros(3))
    write_hdf5(name, "/x", np.ones(5))
    np.testing.assert_array_equal(read_hdf5(name, "/x"), np.ones(5))


def test_hdf5_nested_groups(tmp_path):
    name = str(tmp_path / "stats.h5")
    write_hdf5(name, "/world/mean", np.arange(4.0))
    write_hdf5(name, "/world/scale", np.arange(4.0) + 1)
    np.testing.assert_array_equal(read_hdf5(name, "/world/mean"), np.arange(4.0))


def test_find_files_and_read_txt(tmp_path):
    (tmp_path / "sub").mkdir()
    for n in ["a.wav", "b.wav", "sub/c.wav", "d.txt"]:
        (tmp_path / n).write_bytes(b"")
    found = sorted(find_files(str(tmp_path), "*.wav"))
    assert len(found) == 3
    rel = sorted(find_files(str(tmp_path), "*.wav", use_dir_name=False))
    assert rel[0] == "a.wav" and "sub/c.wav" in rel

    lst = tmp_path / "list.scp"
    lst.write_text("x.wav\n\ny.wav\n")
    assert read_txt(str(lst)) == ["x.wav", "y.wav"]


def test_background_generator_order_and_stop():
    @background(max_prefetch=4)
    def gen():
        for i in range(10):
            yield i

    g = gen()
    assert isinstance(g, BackgroundGenerator)
    assert list(g) == list(range(10))


def test_background_generator_honors_prefetch_depth():
    # the reference's decorator dropped max_prefetch (utils.py:216); ours
    # must actually size the queue
    @background(max_prefetch=7)
    def gen():
        while True:
            yield 0

    g = gen()
    assert g.queue.maxsize == 7


def test_background_generator_propagates_producer_errors():
    # a pipeline error (corrupt h5, missing wav) must reach the consumer
    # as the original exception, not a silent StopIteration
    @background(max_prefetch=2)
    def gen():
        yield 1
        raise ValueError("corrupt h5")

    g = gen()
    assert next(g) == 1
    with pytest.raises(ValueError, match="corrupt h5"):
        next(g)


def test_extend_time():
    h = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = extend_time(h, 4)
    assert out.shape == (12, 2)
    np.testing.assert_array_equal(out[0], out[3])
    np.testing.assert_array_equal(out[4], h[1])


def test_scaler_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.preprocessing")
    rng = np.random.RandomState(0)
    ours, theirs = StandardScaler(), sklearn.StandardScaler()
    for _ in range(5):
        chunk = rng.randn(rng.randint(10, 100), 6) * 3 + 1.5
        ours.partial_fit(chunk)
        theirs.partial_fit(chunk)
    np.testing.assert_allclose(ours.mean_, theirs.mean_, rtol=1e-10)
    np.testing.assert_allclose(ours.scale_, theirs.scale_, rtol=1e-10)


def test_scaler_transform_roundtrip():
    rng = np.random.RandomState(3)
    s = StandardScaler()
    x = rng.randn(500, 4) * 2 + 7
    s.partial_fit(x)
    z = s.transform(x)
    np.testing.assert_allclose(z.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(z.std(axis=0), 1, atol=1e-3)
    np.testing.assert_allclose(s.inverse_transform(z), x, rtol=1e-4, atol=1e-4)


def test_scaler_constant_dim_pinned():
    s = StandardScaler()
    x = np.ones((100, 2))
    x[:, 1] = np.random.randn(100)
    s.partial_fit(x)
    assert s.scale_[0] == 1.0  # constant dim must not blow up


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "t.wav")
    x = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
    write_wav(path, x, 16000)
    y, fs = read_wav(path, dtype="float32")
    assert fs == 16000
    assert y.dtype == np.float32
    np.testing.assert_allclose(x, y, atol=0.51 / 32768)  # symmetric 32768 scale

    y_int, fs = read_wav(path, dtype="int16")
    assert y_int.dtype == np.int16
    write_wav(str(tmp_path / "t2.wav"), y_int, 16000)
    y2, _ = read_wav(str(tmp_path / "t2.wav"), dtype="int16")
    np.testing.assert_array_equal(y_int, y2)
