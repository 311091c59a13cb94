#!/usr/bin/env python
"""Feature-extraction CLI.

Equivalent of the reference ``feature_extract.py`` (`bin/
feature_extract.py:272-389`): three feature types (world / melspc / mcep),
70 Hz FIR high-pass prefilter, per-utterance HDF5 outputs
(``/world``, ``/melspc``, ``/mcep``), optional filtered-wav rewrite, and
``--n_jobs`` multiprocessing fan-out over the file list.  All DSP comes
from the in-repo ``dsp`` package (WORLD/SPTK/librosa are not available).
"""

from __future__ import annotations

import argparse
import logging
import multiprocessing as mp
import os
import sys

import numpy as np

from pytorchwavenetvocoder_tpu.bin.common import (
    configure_logging,
    echo_args,
    enable_compilation_cache,
    strtobool,
)

EPS = 1e-10


def _load_and_prefilter(wav_name: str, args):
    from pytorchwavenetvocoder_tpu.dsp.filters import low_cut_filter
    from scipy.io import wavfile

    fs, x = wavfile.read(wav_name)
    if x.dtype != np.int16:
        logging.warning("wav file format is not 16 bit PCM.")
    x = np.array(x, dtype=np.float64)
    if args.highpass_cutoff != 0:
        x = low_cut_filter(x, fs, cutoff=args.highpass_cutoff)
    if fs != args.fs:
        logging.error("sampling frequency is not matched.")
        sys.exit(1)
    return fs, x


def _maybe_save_wav(wav_name: str, fs: int, x: np.ndarray, args) -> None:
    from scipy.io import wavfile

    if args.highpass_cutoff != 0 and args.save_wav:
        wavfile.write(args.wavdir + "/" + os.path.basename(wav_name), fs,
                      np.int16(x))


def world_feature_extract(wav_list, args) -> None:
    """[uv, cont_f0_lpf, mcep, codeap] -> /world (reference :151-196)."""
    from pytorchwavenetvocoder_tpu.utils import write_hdf5

    if getattr(args, "device", "host") == "jax":
        # CheapTrick + sp2mc + D4C batched through XLA (TPU if present);
        # Harvest F0 stays host-side.  Frames from MANY utterances share
        # fixed-shape device batches, amortizing the dispatch cost and
        # compiling exactly one kernel shape.
        from pytorchwavenetvocoder_tpu.dsp.jax_dsp import (
            world_analyze_jax_many)

        group_frames = 8192  # ~2 device batches of 4096 frames
        hop = int(args.fs * args.shiftms / 1000.0)
        group, n_queued, done = [], 0, 0

        def flush():
            nonlocal group, n_queued, done
            if not group:
                return
            feats = world_analyze_jax_many(
                [x for _, _, x in group], args.fs, shiftms=args.shiftms,
                minf0=args.minf0, maxf0=args.maxf0, fftl=args.fftl,
                mcep_dim=args.mcep_dim, mcep_alpha=args.mcep_alpha,
                f0_device=getattr(args, "f0_device", "host"))
            for (wav_name, fs, x), f in zip(group, feats):
                hdf5name = (args.hdf5dir + "/"
                            + os.path.basename(wav_name).replace(".wav", ".h5"))
                write_hdf5(hdf5name, "/world", np.float32(f))
                _maybe_save_wav(wav_name, fs, x, args)
            done += len(group)
            logging.info("device batch done (%d/%d utterances)",
                         done, len(wav_list))
            group, n_queued = [], 0

        for wav_name in wav_list:
            fs, x = _load_and_prefilter(wav_name, args)
            group.append((wav_name, fs, x))
            n_queued += len(x) // hop + 1
            if n_queued >= group_frames:
                flush()
        flush()
        return

    from pytorchwavenetvocoder_tpu.dsp.world import world_analyze

    for i, wav_name in enumerate(wav_list):
        logging.info("now processing %s (%d/%d)", wav_name, i + 1, len(wav_list))
        fs, x = _load_and_prefilter(wav_name, args)
        feats = world_analyze(
            x, fs, shiftms=args.shiftms, minf0=args.minf0, maxf0=args.maxf0,
            fftl=args.fftl, mcep_dim=args.mcep_dim, mcep_alpha=args.mcep_alpha)
        hdf5name = args.hdf5dir + "/" + os.path.basename(wav_name).replace(".wav", ".h5")
        write_hdf5(hdf5name, "/world", np.float32(feats))
        _maybe_save_wav(wav_name, fs, x, args)


def melspectrogram_extract(wav_list, args) -> None:
    """log10 magnitude mel spectrogram -> /melspc (reference :199-237)."""
    from pytorchwavenetvocoder_tpu.dsp.spectral import melspectrogram
    from pytorchwavenetvocoder_tpu.utils import write_hdf5

    for i, wav_name in enumerate(wav_list):
        logging.info("now processing %s (%d/%d)", wav_name, i + 1, len(wav_list))
        fs, x = _load_and_prefilter(wav_name, args)
        x_norm = x / (np.iinfo(np.int16).max + 1)
        shiftl = int(args.shiftms * fs * 0.001)
        if getattr(args, "device", "host") == "jax":
            from pytorchwavenetvocoder_tpu.dsp.jax_dsp import (
                melspectrogram_jax)

            # reflect-pad (STFT centering) on the true signal FIRST,
            # then zero-pad to a length bucket so XLA compiles per
            # bucket, not per utterance length; surplus frames sliced
            n_frames = len(x_norm) // shiftl + 1
            xr = np.pad(x_norm, (args.fftl // 2, args.fftl // 2),
                        mode="reflect")
            pad = -len(xr) % 16384
            mspc = np.asarray(melspectrogram_jax(
                np.pad(xr, (0, pad)), fs, n_fft=args.fftl,
                hop_length=shiftl, n_mels=args.mspc_dim,
                fmin=args.fmin if args.fmin is not None else 0,
                fmax=args.fmax if args.fmax is not None else fs // 2,
                power=1.0, center=False))[:n_frames]
        else:
            mspc = melspectrogram(
                x_norm, fs, n_fft=args.fftl, hop_length=shiftl,
                n_mels=args.mspc_dim,
                fmin=args.fmin if args.fmin is not None else 0,
                fmax=args.fmax if args.fmax is not None else fs // 2,
                power=1.0)
        mspc = np.log10(np.maximum(EPS, mspc))
        hdf5name = args.hdf5dir + "/" + os.path.basename(wav_name).replace(".wav", ".h5")
        write_hdf5(hdf5name, "/melspc", np.float32(mspc))
        _maybe_save_wav(wav_name, fs, x, args)


def melcepstrum_extract(wav_list, args) -> None:
    """Framewise STFT mel-cepstrum -> /mcep (reference :240-269)."""
    from pytorchwavenetvocoder_tpu.dsp.cepstrum import stft_mcep
    from pytorchwavenetvocoder_tpu.utils import write_hdf5

    for i, wav_name in enumerate(wav_list):
        logging.info("now processing %s (%d/%d)", wav_name, i + 1, len(wav_list))
        fs, x = _load_and_prefilter(wav_name, args)
        shiftl = int(args.shiftms * fs * 0.001)
        if getattr(args, "device", "host") == "jax":
            from pytorchwavenetvocoder_tpu.dsp.jax_dsp import stft_mcep_jax

            n_frame = max(0, (len(x) - args.fftl) // shiftl + 1)
            pad = -len(x) % 16384
            mcep = np.asarray(stft_mcep_jax(
                np.pad(x, (0, pad)), args.fftl, shiftl, args.mcep_dim,
                args.mcep_alpha))[:n_frame]
        else:
            mcep = stft_mcep(x, args.fftl, shiftl, args.mcep_dim,
                             args.mcep_alpha)
        hdf5name = args.hdf5dir + "/" + os.path.basename(wav_name).replace(".wav", ".h5")
        write_hdf5(hdf5name, "/mcep", np.float32(mcep))
        _maybe_save_wav(wav_name, fs, x, args)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Extract acoustic features")
    parser.add_argument("--waveforms", default=None,
                        help="directory or list of filename of input wavfile")
    parser.add_argument("--hdf5dir", default=None,
                        help="directory to save hdf5")
    parser.add_argument("--wavdir", default=None,
                        help="directory to save of preprocessed wav file")
    parser.add_argument("--fs", default=16000, type=int)
    parser.add_argument("--shiftms", default=5, type=float)
    parser.add_argument("--feature_type", default="world",
                        choices=["world", "melspc", "mcep"], type=str)
    parser.add_argument("--mspc_dim", default=80, type=int)
    parser.add_argument("--minf0", default=40, type=int)
    parser.add_argument("--maxf0", default=400, type=int)
    parser.add_argument("--fmin", default=None, nargs="?", type=int)
    parser.add_argument("--fmax", default=None, nargs="?", type=int)
    parser.add_argument("--mcep_dim", default=24, type=int)
    parser.add_argument("--mcep_alpha", default=0.41, type=float)
    parser.add_argument("--fftl", default=1024, type=int)
    parser.add_argument("--highpass_cutoff", default=70, type=int)
    parser.add_argument("--device", default="host", choices=["host", "jax"],
                        help="host: numpy/C++ DSP with --n_jobs process "
                        "fan-out; jax: spectral analyses batched through "
                        "XLA (TPU when available, single process)")
    parser.add_argument("--f0_device", default="host",
                        choices=["host", "jax"],
                        help="jax: Harvest F0's heavy stages also run on "
                        "device (world + --device jax only; f32 numerics, "
                        "see dsp/harvest_jax.py)")
    parser.add_argument("--save_wav", default=True, type=strtobool)
    parser.add_argument("--n_jobs", default=10, type=int)
    parser.add_argument("--verbose", default=1, type=int)
    return parser


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    configure_logging(args.verbose)
    echo_args(args)
    if args.device == "jax":
        enable_compilation_cache()
    if args.f0_device == "jax" and (args.device != "jax"
                                    or args.feature_type != "world"):
        # refuse rather than silently fall back: the caller asked for a
        # specific numeric path and would get another
        raise SystemExit("--f0_device jax requires --device jax and "
                         "--feature_type world")

    from pytorchwavenetvocoder_tpu.utils import find_files, read_txt

    if os.path.isdir(args.waveforms):
        file_list = sorted(find_files(args.waveforms, "*.wav"))
    else:
        file_list = read_txt(args.waveforms)
    logging.info("number of utterances = %d", len(file_list))

    if args.wavdir and not os.path.exists(args.wavdir) \
            and args.highpass_cutoff != 0 and args.save_wav:
        os.makedirs(args.wavdir, exist_ok=True)
    if args.hdf5dir and not os.path.exists(args.hdf5dir):
        os.makedirs(args.hdf5dir, exist_ok=True)

    target_fn = {"world": world_feature_extract,
                 "melspc": melspectrogram_extract,
                 "mcep": melcepstrum_extract}[args.feature_type]

    n_jobs = max(1, min(args.n_jobs, len(file_list)))
    if args.device == "jax" and n_jobs > 1:
        logging.info("--device jax runs single-process (the accelerator "
                     "is the parallel axis); ignoring --n_jobs %d", n_jobs)
        n_jobs = 1
    if n_jobs == 1:
        target_fn(file_list, args)
        return
    file_lists = [f.tolist() for f in np.array_split(file_list, n_jobs)]
    processes = []
    for f in file_lists:
        p = mp.Process(target=target_fn, args=(f, args))
        p.start()
        processes.append(p)
    for p in processes:
        p.join()
    if any(p.exitcode != 0 for p in processes):
        logging.error("feature extraction failed in a worker process.")
        sys.exit(1)


if __name__ == "__main__":
    main()
