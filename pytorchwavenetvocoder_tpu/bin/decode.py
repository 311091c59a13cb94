#!/usr/bin/env python
"""Decoder CLI — batched AR synthesis.

Equivalent of the reference decoder (`bin/decode.py:177-338`), consuming
the same 3-file model bundle (checkpoint + model.conf + stats.h5) and
writing PCM-16 wavs.  The reference forks one process per GPU and runs a
per-sample Python loop (`decode.py:274-338`); here the whole fleet is one
``lax.scan`` decode with the batch dim sharded over the device mesh
(``--n_devices``; ``--n_gpus`` alias).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from pytorchwavenetvocoder_tpu.bin.common import (
    configure_logging,
    echo_args,
    enable_compilation_cache,
)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Decode with a trained WaveNet")
    parser.add_argument("--feats", required=True, type=str,
                        help="directory or list of aux feat files")
    parser.add_argument("--stats", required=True, type=str,
                        help="hdf5 file including statistics")
    parser.add_argument("--checkpoint", required=True, type=str,
                        help="model checkpoint to use")
    parser.add_argument("--config", required=True, type=str,
                        help="model.conf path (or its directory)")
    parser.add_argument("--outdir", required=True, type=str,
                        help="directory to save generated wavs")
    parser.add_argument("--fs", default=16000, type=int)
    parser.add_argument("--batch_size", default=32, type=int,
                        help="number of utterances decoded in lockstep")
    parser.add_argument("--n_devices", "--n_gpus", dest="n_devices",
                        default=1, type=int)
    parser.add_argument("--mode", default="sampling",
                        choices=["sampling", "argmax"])
    parser.add_argument("--impl", default="auto",
                        choices=["auto", "scan", "pallas"],
                        help="AR decoder backend (pallas = fused TPU "
                             "kernel, single chip, kernel_size 2)")
    parser.add_argument("--quantize", default=False, action="store_true",
                        help="int8 MXU decode (pallas path; ~1.35x faster, "
                             "small logit error — validate with eval/mcd)")
    parser.add_argument("--intervals", default=1000, type=int,
                        help="log generation progress every this many "
                             "samples (scan impl chunks the decode; the "
                             "fused pallas impl logs per batch). "
                             "Reference default kept (decode.py:198)")
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--verbose", default=1, type=int)
    return parser


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    configure_logging(args.verbose)
    echo_args(args)

    enable_compilation_cache()
    import jax

    from pytorchwavenetvocoder_tpu.data import decode_generator
    from pytorchwavenetvocoder_tpu.models.wavenet import batch_fast_generate
    from pytorchwavenetvocoder_tpu.ops.mulaw import decode_mu_law, encode_mu_law
    from pytorchwavenetvocoder_tpu.ops.scaler import StandardScaler
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import (
        load_checkpoint,
        load_model_conf,
    )
    from pytorchwavenetvocoder_tpu.utils import find_files, read_txt, write_wav

    from pytorchwavenetvocoder_tpu.convert import config_from_json_conf

    conf = load_model_conf(args.config)
    config = config_from_json_conf(conf)
    logging.info("model config: %s", config)

    payload = load_checkpoint(args.checkpoint)
    params = jax.tree.map(lambda v: v, payload["model"])
    logging.info("loaded %d-iter checkpoint", payload.get("iterations", -1))

    scaler = StandardScaler()
    from pytorchwavenetvocoder_tpu.ops.scaler import feature_transform
    from pytorchwavenetvocoder_tpu.utils import read_hdf5

    feature_type = conf.get("feature_type", "world")
    scaler.mean_ = read_hdf5(args.stats, "/" + feature_type + "/mean")
    scaler.scale_ = read_hdf5(args.stats, "/" + feature_type + "/scale")

    if os.path.isdir(args.feats):
        feat_list = sorted(find_files(args.feats, "*.h5"))
    else:
        feat_list = read_txt(args.feats)
    logging.info("number of utterances = %d", len(feat_list))

    # multi-host: each process decodes its shard of the file list with
    # its local devices — the AR fleets are independent, so no
    # collectives are needed (the reference's one-process-per-GPU
    # fan-out, decode.py:261-262, at host granularity)
    from pytorchwavenetvocoder_tpu.parallel import initialize_distributed

    if initialize_distributed() and jax.process_count() > 1:
        pid, np_ = jax.process_index(), jax.process_count()
        feat_list = [f for i, f in enumerate(feat_list) if i % np_ == pid]
        logging.info("process %d/%d decodes %d utterances.",
                     pid, np_, len(feat_list))

    mesh = None
    n_devices = min(args.n_devices, jax.local_device_count())
    if n_devices > 1:
        from jax.sharding import Mesh

        local = np.asarray(jax.local_devices()[:n_devices]).reshape(-1, 1)
        mesh = Mesh(local, axis_names=("data", "model"))

    upsampling_factor = conf.get("upsampling_factor", 80)
    use_upsampling_layer = conf.get("use_upsampling_layer", True)
    generator = decode_generator(
        feat_list,
        batch_size=args.batch_size,
        feature_type=feature_type,
        wav_transform=lambda x: encode_mu_law(x, config.n_quantize),
        feat_transform=feature_transform(
            scaler,
            n_extra=int(bool(conf.get("use_speaker_code", False)))),
        upsampling_factor=upsampling_factor,
        use_upsampling_layer=use_upsampling_layer,
        use_speaker_code=conf.get("use_speaker_code", False),
    )

    os.makedirs(args.outdir, exist_ok=True)

    # Overlap host work with the device AR scan: feature loading for the
    # NEXT batch runs on the prefetch thread while the current fleet
    # decodes, and mu-law inverse + wav writing for the PREVIOUS batch
    # runs on a bounded writer thread (the reference decodes and writes
    # strictly serially per batch, decode.py:312-327).
    import queue as _queue
    import threading as _threading

    from pytorchwavenetvocoder_tpu.utils import BackgroundGenerator

    generator = BackgroundGenerator(generator, max_prefetch=2)
    write_q: _queue.Queue = _queue.Queue(2)
    write_exc: list[BaseException] = []

    def _writer():
        while True:
            item = write_q.get()
            if item is None:
                return
            feat_ids_w, samples_w = item
            try:
                for feat_id, samples in zip(feat_ids_w, samples_w):
                    wav = decode_mu_law(samples, config.n_quantize)
                    path = os.path.join(args.outdir, feat_id + ".wav")
                    write_wav(path, wav.astype(np.float32), args.fs)
                    logging.info("wrote %s (%d samples)", path, len(wav))
            except BaseException as e:  # surface on the main thread
                write_exc.append(e)
                return

    writer = _threading.Thread(target=_writer, daemon=True)
    writer.start()

    rng = jax.random.PRNGKey(args.seed)
    for feat_ids, (x, h, n_samples) in generator:
        if not isinstance(feat_ids, list):
            feat_ids, x_h_n = [feat_ids], (x, h, [n_samples])
            x, h, n_samples = x_h_n
        # pad the batch to a device-mesh multiple (masked rows are free —
        # lockstep scan cost is set by the longest utterance only)
        B = x.shape[0]
        if mesh is not None and B % n_devices != 0:
            pad = n_devices - B % n_devices
            x = np.concatenate([x, np.tile(x[-1:], (pad, 1))], axis=0)
            h = np.concatenate([h, np.tile(h[-1:], (pad, 1, 1))], axis=0)
            n_samples = list(n_samples) + [int(n_samples[-1])] * pad
        rng, key = jax.random.split(rng)
        start = time.time()
        samples_list = batch_fast_generate(
            params, config, x, h, list(n_samples), mode=args.mode,
            rng=key, mesh=mesh, impl=args.impl, quantize=args.quantize,
            intervals=args.intervals)
        elapsed = time.time() - start
        n_gen = sum(int(n) for n in n_samples[:B])
        logging.info("batch of %d utts: %d samples in %.2f s "
                     "(%.1f samples/sec, RTF x%.2f)", B, n_gen, elapsed,
                     n_gen / elapsed, n_gen / elapsed / args.fs)
        queued = False
        while not queued and not write_exc:
            try:  # never block forever on a dead writer
                write_q.put((feat_ids, samples_list[:B]), timeout=1.0)
                queued = True
            except _queue.Full:
                pass
        if write_exc:
            break

    write_q.put(None)
    writer.join()
    if write_exc:
        raise write_exc[0]


if __name__ == "__main__":
    main()
