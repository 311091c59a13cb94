"""Harvest F0 estimation with the heavy stages on device (XLA/TPU).

Reference behavior: ``dsp/harvest.py`` (the published Harvest algorithm;
reference pipeline cite: /root/reference/wavenet_vocoder/bin/
feature_extract.py:179 uses WORLD's harvest for the F0 leg).  This
module reformulates the two compute-heavy stages with static shapes so
they batch across utterances on one compiled XLA program:

- **candidate generation** — Nuttall band-pass bank via batched
  rfft/irfft; negative-going-crossing / peak / dip event trains are
  never compacted (ragged scatters serialize badly on TPU) — instead a
  prefix-cummax / suffix-cummin over the masked event COLUMNS (exact
  int32, with the sub-sample fraction gathered per column afterwards —
  absolute f32 positions would lose ~0.03 samples of precision at the
  largest buckets) hands every analysis frame its four neighboring
  events directly, and the interval-frequency interpolation is
  evaluated closed-form in frame-relative coordinates
  (``_event_tracks_row``); per-frame candidate pool via ``lax.top_k``;
- **instantaneous-frequency refinement** — each (frame, candidate) row
  evaluates the spectral-reassignment formula at its <= 6 harmonic bins
  by DIRECT DTFT (the rfft phase reference cancels in the formula), on
  the identical per-row spectral grid the host uses (n_fft = next
  power of two covering the row's window); chunked with ``lax.map`` to
  bound HBM.

The cheap, inherently sequential tail (voiced-run contour fixing and
zero-phase smoothing, O(T) host work) reuses the host implementation
verbatim, so device and host paths share one definition of the
selection semantics.

Equivalence contract vs the host path: identical algorithm, constants,
and spectral grids; numerics differ only through f32 device arithmetic
(the host runs f64) and through the bucket-padded filter-bank FFT
sizes.  Event times are carried as (exact int32 column, f32 fraction)
pairs so their precision is independent of the utterance length, and
the refinement re-estimates every surviving candidate from the raw
signal, so disagreements are confined to frames sitting exactly on a
voicing-decision threshold.  ``tests/test_harvest_jax.py`` pins the
behavioral criteria (the same golden signals as the host suite) plus
host-vs-device agreement.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from pytorchwavenetvocoder_tpu.dsp.harvest import (
    _ALLOWED_STEP,  # noqa: F401  (re-exported for parity tests)
    _BASIC_PERIOD_MS,
    _CHANNELS_PER_OCTAVE,
    _MAX_CANDIDATES,
    _decimate,
    _fix_contour,
    _nuttall,
    _smooth_contour,
)

# utterance micro-batch per device call: one compiled program per
# (bucket, _U_BATCH) serves any corpus; short groups are zero-padded
_U_BATCH = 8
# sample-length buckets at the 8 kHz analysis rate (1s .. 32s)
_BUCKETS = (8192, 16384, 32768, 65536, 131072, 262144)
# refinement rows per lax.map chunk (bounds the (rows, 6, W) DTFT
# phase tables to ~100 MB)
_REFINE_CHUNK = 4096
# int32 sentinels for "no event" in the column scans (far outside any
# bucket's column range, with headroom so +-1 shifts can't wrap)
_NO_EVT_LO = -(1 << 30)
_NO_EVT_HI = 1 << 30


def _next_pow2(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 0)


# ---------------------------------------------------------------------------
# host-side constants per (bucket, f0 range): filter bank spectra
# ---------------------------------------------------------------------------

# LRU-capped like the host's _H_CACHE: one 32-s-bucket bank is ~180 MB,
# and a long-lived process varying (f0_floor, f0_ceil) per speaker must
# not accumulate one forever
_BANK_CACHE: OrderedDict = OrderedDict()
_BANK_CACHE_MAX = 3
_JIT_CACHE: OrderedDict = OrderedDict()
_JIT_CACHE_MAX = 8


def _bank_constants(n_b: int, fs8: float, f0_floor: float, f0_ceil: float):
    """(H, halves, boundary, n_fft) for one bucket — LRU-cached.

    Same construction as the host ``_band_pass_bank`` (Nuttall window of
    4 boundary periods modulated to the boundary frequency), evaluated
    once in f64 and handed to the device as c64/i32/f32 constants.
    """
    key = (n_b, float(fs8), float(f0_floor), float(f0_ceil))
    hit = _BANK_CACHE.get(key)
    if hit is not None:
        _BANK_CACHE.move_to_end(key)
        return hit
    n_ch = int(np.ceil(
        np.log2(f0_ceil / f0_floor) * _CHANNELS_PER_OCTAVE)) + 1
    boundary = f0_floor * 2.0 ** (np.arange(n_ch) / _CHANNELS_PER_OCTAVE)
    halves = np.round(fs8 / boundary * 2.0).astype(np.int32)
    n_fft = _next_pow2(n_b + 4 * int(halves.max()) + 2)
    H = np.empty((n_ch, n_fft // 2 + 1), np.complex64)
    for i, bf in enumerate(boundary):
        half = int(halves[i])
        m = np.arange(-half, half + 1)
        w = _nuttall(2 * half + 1) * np.cos(2 * np.pi * bf * m / fs8)
        H[i] = np.fft.rfft(w, n=n_fft)
    out = (H, halves, boundary.astype(np.float32), n_fft)
    _BANK_CACHE[key] = out
    if len(_BANK_CACHE) > _BANK_CACHE_MAX:
        _BANK_CACHE.popitem(last=False)
    return out


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------


def _prefix_cummax(a):
    """Inclusive prefix maximum along the last axis (float or int).

    Backend-split on purpose: ``lax.cummax`` compiles pathologically
    slowly on XLA:TPU at this operand shape (>15 min for a vmapped
    (340, 32767) row batch), so TPU gets Hillis-Steele doubling —
    log2(n) unrolled shift+max steps of plain pad/slice/max that
    compile in seconds and cost the same O(n log n) HBM traffic.  On
    CPU the doubling variant is the pathological one (log2(n)
    materialized full-size temporaries on a memory-bound host) and
    ``lax.cummax`` lowers to an efficient sequential loop, so
    everything non-TPU keeps the canonical op.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    if jax.default_backend() != "tpu":
        return lax.cummax(a, axis=a.ndim - 1)
    lowest = (jnp.iinfo(a.dtype).min if jnp.issubdtype(a.dtype, jnp.integer)
              else -jnp.inf)
    n = a.shape[-1]
    shift = 1
    while shift < n:
        pad = jnp.full(a.shape[:-1] + (shift,), lowest, a.dtype)
        a = jnp.maximum(a, jnp.concatenate([pad, a[..., :-shift]], -1))
        shift *= 2
    return a


def _suffix_cummin(a):
    """Inclusive suffix minimum along the last axis (see _prefix_cummax)."""
    import jax
    from jax import lax

    if jax.default_backend() != "tpu":
        return lax.cummin(a, axis=a.ndim - 1, reverse=True)
    return -_prefix_cummax(-a[..., ::-1])[..., ::-1]


def _event_tracks_row(sig, col_cap, t_samples):
    """One signal row -> (interval-frequency track, validity) on t_samples.

    Mirrors the host ``_events_intervals`` + ``np.interp`` step: events
    are negative-going zero crossings with linearly interpolated
    positions (in samples); track = 1/interval (cycles per sample;
    the caller scales by fs) interpolated at interval midpoints; frames
    outside the midpoint span (or rows with < 3 events) are invalid.
    ``col_cap`` bounds the crossing-pair columns to the row's true
    signal extent (the padded bucket tail and the filter ringing past
    the utterance end must not produce events the exact-length host
    path never sees).

    TPU-shaped: instead of compacting the ragged event list (scatters
    serialize badly on TPU), a prefix cummax / suffix cummin over the
    masked event COLUMNS gives every frame its neighboring events in
    O(n) scans + a handful of gathers.  Each crossing-pair column holds
    at most one event with position in (col, col+1], so consecutive
    event positions are strictly increasing — the host's defensive
    positive-interval filter is provably a no-op here, and the
    interpolation needs only the two adjacent intervals:
    ``e_m1 <= e0 <= t < e1 <= e2``.

    Precision: the scans carry exact int32 columns; the sub-sample
    fraction is gathered per column and every position enters the
    arithmetic RELATIVE to the frame time t (an exact small integer in
    f32), so interval/midpoint error stays at f32 rounding of the
    interval itself (~1e-7 relative) regardless of how long the signal
    is.  Absolute f32 positions would lose ~0.03 samples at the 2^18
    buckets — the same order as the sub-sample interpolation itself.
    """
    import jax.numpy as jnp

    n = sig.shape[0]
    s0, s1 = sig[:-1], sig[1:]
    cols = jnp.arange(n - 1, dtype=jnp.int32)
    mask = (s0 > 0) & (s1 <= 0) & (cols < col_cap)
    frac = jnp.where(mask, s0 / jnp.where(mask, s0 - s1, 1.0),
                     0.0)                        # event pos = col + frac
    lo = jnp.int32(_NO_EVT_LO)
    hi = jnp.int32(_NO_EVT_HI)
    cm = _prefix_cummax(jnp.where(mask, cols, lo))   # last event col <= col
    rm = _suffix_cummin(jnp.where(mask, cols, hi))   # first event col >= col
    cm_prev = jnp.concatenate([jnp.array([lo], jnp.int32), cm[:-1]])
    rm_next = jnp.concatenate([rm[1:], jnp.array([hi], jnp.int32)])

    t = t_samples
    inf = jnp.inf

    def rel(c):
        """Event position relative to t; +-inf for the sentinels."""
        cc = jnp.clip(c, 0, n - 2)
        r = (cc.astype(t.dtype) - t) + frac[cc]
        return jnp.where(c <= lo // 2, -inf,
                         jnp.where(c >= hi // 2, inf, r))

    ct = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    has_ct = cm[ct] == ct                       # event inside column ct?
    r_ct = (ct.astype(t.dtype) - t) + frac[ct]
    # bounding events of the interval containing t (one event/column:
    # only column ct itself is ambiguous, later columns are all > t)
    c0 = jnp.where(has_ct & (r_ct <= 0), ct, cm_prev[ct])
    c1 = jnp.where(has_ct & (r_ct > 0), ct, rm_next[ct])
    # the events one step further out
    c_m1 = cm_prev[jnp.clip(c0, 0, n - 2)]
    c2 = rm_next[jnp.clip(c1, 0, n - 2)]
    r0, r1 = rel(c0), rel(c1)
    r_m1, r2 = rel(c_m1), rel(c2)

    f_cur = 1.0 / (r1 - r0)
    mid = 0.5 * (r0 + r1)
    f_rgt = 1.0 / (r2 - r1)
    mid_r = 0.5 * (r1 + r2)
    f_lft = 1.0 / (r0 - r_m1)
    mid_l = 0.5 * (r_m1 + r0)
    wr = (0.0 - mid) / (mid_r - mid)
    wl = (0.0 - mid_l) / (mid - mid_l)
    val_r = jnp.where(jnp.isfinite(r2), f_cur + (f_rgt - f_cur) * wr,
                      f_cur)
    val_l = jnp.where(jnp.isfinite(r_m1), f_lft + (f_cur - f_lft) * wl,
                      f_cur)
    track = jnp.where(0.0 >= mid, val_r, val_l)

    count = mask.sum()
    c_first = rm[0]
    c_last = cm[-1]
    mid_first = 0.5 * (rel(c_first)
                       + rel(rm_next[jnp.clip(c_first, 0, n - 2)]))
    mid_last = 0.5 * (rel(cm_prev[jnp.clip(c_last, 0, n - 2)])
                      + rel(c_last))
    valid = (count >= 3) & (mid_first <= 0.0) & (mid_last >= 0.0)
    return jnp.where(valid, track, 0.0), valid


def _raw_candidates_device(x8, n_true, H, halves, boundary, t_samples,
                           fs8, n_b, n_fft, f0_floor, f0_ceil):
    """Device equivalent of host ``_raw_candidates`` for ONE utterance.

    Returns (T, K) candidate f0 (Hz) and (T, K) relative deviation,
    sorted ascending by deviation, 3%-deduplicated — same contract as
    the host function.  K = min(_MAX_CANDIDATES, n_channels): a narrow
    f0 search range can build a bank with fewer channels than the pool
    width (the host handles that with a partially-filled pool;
    ``lax.top_k`` needs k <= the channel count).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    C = H.shape[0]
    X = jnp.fft.rfft(jnp.pad(x8, (0, n_fft - n_b)))
    Y = jnp.fft.irfft(X[None, :] * H, n_fft, axis=1)
    # compensate each band's group delay (host slices y[half:half+n])
    idx = halves[:, None] + jnp.arange(n_b)[None, :]
    y = jnp.take_along_axis(Y, idx, axis=1)                    # (C, n_b)
    dy = jnp.diff(y, axis=1)
    dyp = jnp.concatenate([dy, dy[:, -1:]], axis=1)
    # rows: the four event types of every band.  Replicating dy's last
    # sample can never fabricate an event (s0 == s1 fails one strict
    # side of the crossing test), and real dy events keep their columns.
    S = jnp.concatenate([y, -y, dyp, -dyp], axis=0)            # (4C, n_b)
    # host pair columns: <= n_true-2 on y rows, <= n_true-3 on dy rows
    # (dy itself is one sample shorter than y)
    caps = jnp.concatenate([jnp.full((2 * C,), n_true - 1),
                            jnp.full((2 * C,), n_true - 2)])

    track, valid = jax.vmap(
        lambda s, cap: _event_tracks_row(s, cap, t_samples))(S, caps)
    track = track * fs8  # cycles/sample -> Hz (linear, commutes w/ interp)
    tracks4 = track.reshape(4, C, -1)                          # (4, C, T)
    valid4 = valid.reshape(4, C, -1).all(axis=0)               # (C, T)

    mean = tracks4.mean(axis=0)
    dev = jnp.sqrt(((tracks4 - mean) ** 2).sum(axis=0) / 3.0)
    rel = jnp.where(mean > 0, dev / jnp.maximum(mean, 1e-9), jnp.inf)
    bf = boundary[:, None]
    ok = (valid4 & (mean >= f0_floor) & (mean <= f0_ceil)
          & (mean >= bf / 1.6) & (mean <= bf * 1.6) & (rel < 0.35))
    relg = jnp.where(ok, rel, jnp.inf).T                       # (T, C)

    # the host's replace-the-worst streaming pool keeps exactly the K
    # smallest deviations -> top_k of the negated deviations
    K = min(_MAX_CANDIDATES, C)
    neg, ch = lax.top_k(-relg, K)                              # (T, K)
    cand_dev = -neg
    cand_f0 = jnp.take_along_axis(mean.T, ch, axis=1)
    live = jnp.isfinite(cand_dev)
    cand_f0 = jnp.where(live, cand_f0, 0.0)

    # dedupe 3% clusters (adjacent channels vote for the same f0);
    # K is small so the host's O(K^2) pass unrolls statically
    for j in range(1, K):
        dup = jnp.zeros(cand_f0.shape[0], bool)
        for i in range(j):
            dup |= ((cand_f0[:, i] > 0)
                    & (jnp.abs(cand_f0[:, j] - cand_f0[:, i])
                       < 0.03 * cand_f0[:, i]))
        cand_f0 = cand_f0.at[:, j].set(jnp.where(dup, 0.0, cand_f0[:, j]))
        cand_dev = cand_dev.at[:, j].set(
            jnp.where(dup, jnp.inf, cand_dev[:, j]))
    order = jnp.argsort(cand_dev, axis=1)
    return (jnp.take_along_axis(cand_f0, order, axis=1),
            jnp.take_along_axis(cand_dev, order, axis=1))


def _refine_device(x8, n_true, cand_f0, t_samples, fs8, max_half):
    """Device equivalent of host ``_refine_candidates`` (one utterance).

    Every (frame, candidate) row gets a Blackman window of half-width
    1.5/f0 centered on its frame, the spectral-reassignment
    instantaneous frequency at its <= 6 harmonic bins, and the
    amplitude-weighted refined f0 + reliability score.  The harmonic
    bins live on the SAME per-row spectral grid the host uses (n_fft =
    next power of two covering the row's window, a pure function of
    the candidate f0) and are evaluated by direct DTFT — the rfft
    phase reference is a per-row constant factor that cancels in both
    |X_w|^2 and Im{X_d conj(X_w)}, and 6 bins of a <= 451-tap window
    cost far less than a padded FFT.  Rows run in fixed-size chunks
    (``lax.map``) so HBM stays bounded.
    """
    import jax.numpy as jnp
    from jax import lax

    T, K = cand_f0.shape
    m = jnp.arange(-max_half, max_half + 1)
    ks = jnp.arange(1, 7, dtype=jnp.float32)

    flat_f0 = cand_f0.reshape(-1)
    centers = jnp.repeat(jnp.round(t_samples).astype(jnp.int32), K)
    rows = flat_f0.shape[0]
    pad_rows = -rows % _REFINE_CHUNK
    flat_f0 = jnp.pad(flat_f0, (0, pad_rows))
    centers = jnp.pad(centers, (0, pad_rows))

    def chunk(args):
        f0, ctr = args
        f0safe = jnp.maximum(f0, 1.0)
        half = jnp.round(1.5 * fs8 / f0safe)
        half = jnp.minimum(half, max_half)
        pos = ctr[:, None] + m[None, :]
        inside = (pos >= 0) & (pos < n_true)
        seg = jnp.where(inside,
                        x8[jnp.clip(pos, 0, x8.shape[0] - 1)], 0.0)
        hw = half[:, None]
        phase = jnp.pi * m[None, :] / (hw + 1.0)
        in_win = jnp.abs(m[None, :]) <= hw
        win = jnp.where(in_win, 0.42 + 0.5 * jnp.cos(phase)
                        + 0.08 * jnp.cos(2 * phase), 0.0)
        dwin = jnp.where(in_win,
                         -(jnp.pi / (hw + 1.0))
                         * (0.5 * jnp.sin(phase)
                            + 0.16 * jnp.sin(2 * phase)), 0.0)
        yw = seg * win
        yd = seg * dwin

        # per-row spectral grid, identical to the host's: df = fs8/nf
        # with nf = 2^ceil(log2(2*half+1)) (2*half+1 is odd, so log2 is
        # never an exact integer and ceil is exact)
        nf = jnp.exp2(jnp.ceil(jnp.log2(2.0 * half + 1.0)))
        df = fs8 / nf
        n_harm = jnp.minimum(6.0, fs8 / 2.0 / jnp.maximum(f0safe, 1e-9))
        use = ks[None, :] <= n_harm[:, None]
        bins = jnp.clip(jnp.round(ks[None, :] * f0[:, None]
                                  / df[:, None]),
                        0.0, nf[:, None] / 2.0)                # (rows, 6)
        # direct DTFT at the harmonic bins.  theta = 2*pi*bins*m/nf with
        # bins*m an exact f32 integer (< 2^24) and nf a power of two, so
        # reducing mod 1 BEFORE scaling by 2*pi keeps the angles
        # full-precision — naive 2*pi*f*m/fs8 loses 5 digits at
        # theta ~ 700 rad
        ratio = bins[:, :, None] * m[None, None, :].astype(jnp.float32) \
            / nf[:, None, None]
        theta = (2.0 * jnp.pi) * (ratio - jnp.floor(ratio))
        cth = jnp.cos(theta)
        sth = jnp.sin(theta)
        # HIGHEST: the TPU default lowers f32 contractions to bf16
        # passes — fine for the WaveNet, not for a frequency estimator
        # whose contract is f32-rounding-level host agreement (the
        # refinement is a trivial share of the stage's FLOPs)
        import jax as _jax

        hp = _jax.lax.Precision.HIGHEST
        Xw_re = jnp.einsum("rw,rkw->rk", yw, cth, precision=hp)
        Xw_im = -jnp.einsum("rw,rkw->rk", yw, sth, precision=hp)
        Xd_re = jnp.einsum("rw,rkw->rk", yd, cth, precision=hp)
        Xd_im = -jnp.einsum("rw,rkw->rk", yd, sth, precision=hp)

        power = Xw_re ** 2 + Xw_im ** 2 + 1e-30
        inst = (bins * df[:, None]
                - (fs8 / (2.0 * jnp.pi))
                * (Xd_im * Xw_re - Xd_re * Xw_im) / power)
        est = inst / ks[None, :]
        amp = jnp.where(use, jnp.sqrt(power), 0.0)
        amp_sum = amp.sum(axis=1)
        refined = ((amp * est).sum(axis=1)
                   / jnp.maximum(amp_sum, 1e-30))
        dev = (amp * jnp.abs(est - refined[:, None])).sum(axis=1)
        score = dev / (jnp.maximum(amp_sum, 1e-30)
                       * jnp.maximum(refined, 1e-9))
        return refined, score

    n_chunks = flat_f0.shape[0] // _REFINE_CHUNK
    refined, score = lax.map(
        chunk, (flat_f0.reshape(n_chunks, _REFINE_CHUNK),
                centers.reshape(n_chunks, _REFINE_CHUNK)))
    refined = refined.reshape(-1)[:rows]
    score = score.reshape(-1)[:rows]

    live = cand_f0.reshape(-1) > 0
    ok = live & (refined > 0) & jnp.isfinite(score)
    out_f0 = jnp.where(ok, refined, 0.0).reshape(T, K)
    out_sc = jnp.where(ok, score, jnp.inf).reshape(T, K)
    return out_f0, out_sc


def _candidates_jit(fs8: float, n_b: int, f0_floor: float, f0_ceil: float,
                    max_half: int, t_frames: int):
    """Build (and cache via jax.jit) the batched device program."""
    import jax
    import jax.numpy as jnp

    H, halves, boundary, n_fft = _bank_constants(n_b, fs8, f0_floor,
                                                 f0_ceil)

    @jax.jit
    def run(x8b, n_trues):
        t_samples = jnp.arange(t_frames, dtype=jnp.float32) * jnp.float32(
            fs8 * _BASIC_PERIOD_MS / 1000.0)

        def one(x8, n_true):
            cf0, _ = _raw_candidates_device(
                x8, n_true, jnp.asarray(H), jnp.asarray(halves),
                jnp.asarray(boundary), t_samples, fs8, n_b, n_fft,
                f0_floor, f0_ceil)
            return _refine_device(x8, n_true, cf0, t_samples, fs8,
                                  max_half)

        return jax.vmap(one)(x8b, n_trues)

    return run


def _get_program(fs8, n_b, f0_floor, f0_ceil):
    key = (float(fs8), n_b, float(f0_floor), float(f0_ceil))
    prog = _JIT_CACHE.get(key)
    if prog is None:
        max_half = int(np.round(1.5 * fs8 / f0_floor))
        t_frames = int(np.ceil(n_b / (fs8 * _BASIC_PERIOD_MS / 1000.0)))
        prog = _candidates_jit(fs8, n_b, f0_floor, f0_ceil,
                               max_half, t_frames)
        _JIT_CACHE[key] = prog
        if len(_JIT_CACHE) > _JIT_CACHE_MAX:
            # dropping the reference releases the compiled executable
            # and its embedded (~100 MB at the largest buckets) filter
            # bank constants
            _JIT_CACHE.popitem(last=False)
    else:
        _JIT_CACHE.move_to_end(key)
    return prog


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def harvest_jax_many(xs: list, fs: int, f0_floor: float = 71.0,
                     f0_ceil: float = 800.0,
                     shiftms: float = 5.0) -> list:
    """Harvest F0 of MANY waveforms with the heavy stages on device.

    Same output contract as ``dsp.harvest.harvest`` per utterance.
    Utterances are decimated to the 8 kHz analysis rate on the host,
    grouped into sample-length buckets, and each bucket group runs as
    zero-padded micro-batches of ``_U_BATCH`` through ONE compiled XLA
    program (so a whole corpus compiles at most ``len(_BUCKETS)``
    shapes).  Contour fixing/smoothing reuse the host implementation.

    Utterances too short for the channel bank (where the host adjusts
    ``f0_floor`` from the signal length, i.e. shorter than
    ``3 fs8 / f0_floor`` samples) or longer than the largest bucket
    fall back to the host path for that utterance.
    """
    from pytorchwavenetvocoder_tpu.dsp.harvest import harvest as _host

    results: list = [None] * len(xs)
    ceil_cap = None
    groups: dict = {}
    metas: dict = {}
    for i, x in enumerate(xs):
        x = np.asarray(x, np.float64)
        hop = int(fs * shiftms / 1000.0)
        n_out = len(x) // hop + 1
        if len(x) < int(0.05 * fs) or not np.any(x):
            results[i] = np.zeros(n_out)
            continue
        x8, fs8 = _decimate(x, fs)
        if ceil_cap is None:
            ceil_cap = min(f0_ceil, fs8 / 4.0)
        floor = max(f0_floor, 3.0 * fs8 / len(x8)) if len(x8) else f0_floor
        if floor != f0_floor or len(x8) > _BUCKETS[-1]:
            results[i] = _host(x, fs, f0_floor=f0_floor, f0_ceil=f0_ceil,
                               shiftms=shiftms)
            continue
        n_b = next(b for b in _BUCKETS if b >= len(x8))
        groups.setdefault((n_b, fs8), []).append(i)
        metas[i] = (x8, n_out, hop, fs8)

    for (n_b, fs8), idxs in groups.items():
        prog = _get_program(fs8, n_b, f0_floor, ceil_cap)
        # per-call micro-batch scaled to the bucket so the (4C, n_b)
        # event matrices stay bounded in HBM at the largest buckets
        u_batch = min(_U_BATCH, max(1, (1 << 20) // n_b))
        for g0 in range(0, len(idxs), u_batch):
            batch = idxs[g0:g0 + u_batch]
            xb = np.zeros((u_batch, n_b), np.float32)
            nt = np.zeros(u_batch, np.int32)
            for j, i in enumerate(batch):
                x8 = metas[i][0]
                xb[j, :len(x8)] = x8
                nt[j] = len(x8)
            cf0, csc = prog(xb, nt)
            cf0 = np.asarray(cf0, np.float64)
            csc = np.asarray(csc, np.float64)
            for j, i in enumerate(batch):
                x8, n_out, hop, fs8_i = metas[i]
                duration = len(x8) / fs8_i
                t_true = len(np.arange(0.0, duration,
                                       _BASIC_PERIOD_MS / 1000.0))
                f0_1ms = _fix_contour(cf0[j, :t_true], csc[j, :t_true],
                                      f0_floor, ceil_cap)
                f0_1ms = _smooth_contour(f0_1ms)
                pick = np.clip(np.round(np.arange(n_out) * hop / fs
                                        / (_BASIC_PERIOD_MS / 1000.0))
                               .astype(int), 0, max(len(f0_1ms) - 1, 0))
                results[i] = (f0_1ms[pick] if len(f0_1ms)
                              else np.zeros(n_out))
    return results


def harvest_jax(x: np.ndarray, fs: int, f0_floor: float = 71.0,
                f0_ceil: float = 800.0,
                shiftms: float = 5.0) -> np.ndarray:
    """Single-utterance convenience wrapper over ``harvest_jax_many``."""
    return harvest_jax_many([x], fs, f0_floor=f0_floor, f0_ceil=f0_ceil,
                            shiftms=shiftms)[0]
