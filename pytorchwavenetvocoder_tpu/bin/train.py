#!/usr/bin/env python
"""Trainer CLI.

TPU-native equivalent of the reference trainer (`bin/train.py:335-568`):
same flag surface and on-disk contract (expdir with ``model.conf`` +
``checkpoint-<iter>.pkl``), but the step is a sharding-annotated jit over
a device mesh (``--n_devices``; ``--n_gpus`` kept as an alias) instead of
``nn.DataParallel``, and the model config is JSON instead of a pickled
argparse Namespace.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np

from pytorchwavenetvocoder_tpu.bin.common import (
    configure_logging,
    enable_compilation_cache,
    echo_args,
    strtobool,
)


def _length_bucket(n: int) -> int:
    """Smallest s >= n from the {2^k, 3*2^(k-1)} ladder (<= 33% pad)."""
    s = 1
    while True:
        if s >= n:
            return s
        if 3 * s // 2 >= n:
            return 3 * s // 2
        s *= 2


def _pad_utterance_batch(batch_x: np.ndarray, batch_h: np.ndarray,
                         batch_t: np.ndarray, upsampling_factor: int):
    """Pad an utterance-mode batch up to a length bucket.

    Utterance mode feeds a different sequence length to the jitted step
    per utterance, which would retrace/recompile XLA for every distinct
    length in the corpus (seconds to minutes per compile on TPU).
    Bucketing bounds that to ~2 log2(max_len) shapes at <= 33% padded
    compute.  Pad targets are -1 — excluded from masked_ce_loss — pad
    aux frames are zero, pad inputs are class 0 (arbitrary: every
    padded position's loss is masked).
    """
    if upsampling_factor > 0:
        frames = _length_bucket(batch_h.shape[1])
        pad_f = frames - batch_h.shape[1]
        pad_t = frames * upsampling_factor - batch_x.shape[1]
    else:
        T = _length_bucket(batch_x.shape[1])
        pad_t = T - batch_x.shape[1]
        pad_f = T - batch_h.shape[1]
    if pad_t == 0 and pad_f == 0:
        return batch_x, batch_h, batch_t
    batch_x = np.pad(batch_x, ((0, 0), (0, pad_t)))
    batch_t = np.pad(batch_t, ((0, 0), (0, pad_t)), constant_values=-1)
    batch_h = np.pad(batch_h, ((0, 0), (0, pad_f), (0, 0)))
    return batch_x, batch_h, batch_t


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train a WaveNet vocoder on TPU")
    # path setting (reference train.py:339-348)
    parser.add_argument("--waveforms", required=True, type=str,
                        help="directory or list of wav files")
    parser.add_argument("--feats", required=True, type=str,
                        help="directory or list of aux feat files")
    parser.add_argument("--stats", required=True, type=str,
                        help="hdf5 file including statistics")
    parser.add_argument("--expdir", required=True, type=str,
                        help="directory to save the model")
    parser.add_argument("--feature_type", default="world",
                        choices=["world", "melspc"], type=str)
    # network structure (reference train.py:350-369)
    parser.add_argument("--n_quantize", default=256, type=int)
    parser.add_argument("--n_aux", default=28, type=int)
    parser.add_argument("--n_resch", default=512, type=int)
    parser.add_argument("--n_skipch", default=256, type=int)
    parser.add_argument("--dilation_depth", default=10, type=int)
    parser.add_argument("--dilation_repeat", default=1, type=int)
    parser.add_argument("--kernel_size", default=2, type=int)
    parser.add_argument("--upsampling_factor", default=80, type=int)
    parser.add_argument("--use_upsampling_layer", default=True, type=strtobool)
    parser.add_argument("--use_speaker_code", default=False, type=strtobool)
    # training setting (reference train.py:371-380)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--weight_decay", default=0.0, type=float)
    parser.add_argument("--batch_length", default=20000, type=int,
                        help="batch length (0 = utterance batch)")
    parser.add_argument("--batch_size", default=1, type=int)
    parser.add_argument("--iters", default=200000, type=int)
    # other (reference train.py:382-393)
    parser.add_argument("--checkpoint_interval", default=10000, type=int)
    parser.add_argument("--intervals", default=100, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--resume", default=None, nargs="?", type=str,
                        help="checkpoint path to resume from, or 'latest' "
                             "to auto-resume from the newest checkpoint in "
                             "--expdir (preemption recovery)")
    parser.add_argument("--n_devices", "--n_gpus", dest="n_devices",
                        default=1, type=int,
                        help="number of devices for data parallelism")
    parser.add_argument("--model_parallel", default=1, type=int,
                        help="devices per tensor-parallel group: layer "
                             "weights' channel dims + Adam moments shard "
                             "over the mesh 'model' axis (XLA path only; "
                             "n_devices/model_parallel stay data-parallel)")
    parser.add_argument("--compute_dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="matmul dtype (accumulation stays f32)")
    parser.add_argument("--fused", default="auto",
                        choices=["auto", "true", "false"],
                        help="fused Pallas train kernels "
                             "(ops/train_kernel.py); auto = on for TPU "
                             "when the config qualifies")
    parser.add_argument("--remat", default="auto",
                        choices=["auto", "true", "false"],
                        help="checkpoint residual layers in the backward "
                             "(needed to fit HBM at large per-device "
                             "batches; 'auto' enables it when batch_size"
                             " * batch_length / n_devices > 30000, or "
                             "always in utterance-batch mode)")
    parser.add_argument("--profile_dir", default=None, type=str,
                        help="write a jax.profiler trace of iterations "
                             "10..20 to this directory (for xprof/"
                             "tensorboard)")
    parser.add_argument("--verbose", default=1, type=int)
    return parser


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    configure_logging(args.verbose)
    echo_args(args)

    enable_compilation_cache()
    import jax

    from pytorchwavenetvocoder_tpu.data import train_generator
    from pytorchwavenetvocoder_tpu.models.wavenet import WaveNetConfig
    from pytorchwavenetvocoder_tpu.ops.mulaw import encode_mu_law
    from pytorchwavenetvocoder_tpu.ops.scaler import StandardScaler
    from pytorchwavenetvocoder_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
        save_checkpoint,
        shard_batch,
    )
    from pytorchwavenetvocoder_tpu.parallel.checkpoint import (
        restore_train_state,
        save_model_conf,
    )
    from pytorchwavenetvocoder_tpu.utils import find_files, read_hdf5, read_txt

    os.makedirs(args.expdir, exist_ok=True)
    np.random.seed(args.seed)

    # model config; upsampling_factor=0 disables the learned upsampler
    upsampling_factor = args.upsampling_factor if args.use_upsampling_layer else 0
    config = WaveNetConfig(
        n_quantize=args.n_quantize,
        n_aux=args.n_aux,
        n_resch=args.n_resch,
        n_skipch=args.n_skipch,
        dilation_depth=args.dilation_depth,
        dilation_repeat=args.dilation_repeat,
        kernel_size=args.kernel_size,
        upsampling_factor=upsampling_factor,
        compute_dtype=args.compute_dtype,
    )
    logging.info("receptive field = %d samples", config.receptive_field)

    # persist full run config (replaces the pickled Namespace model.conf);
    # args take precedence so `upsampling_factor` stays the pipeline's
    # frame factor even when the learned upsampler is disabled (the model
    # side is reconstructed from use_upsampling_layer at decode time)
    save_model_conf(args.expdir, dict(config.to_dict(), **vars(args)))

    # transforms
    from pytorchwavenetvocoder_tpu.ops.scaler import feature_transform

    scaler = StandardScaler()
    scaler.mean_ = read_hdf5(args.stats, "/" + args.feature_type + "/mean")
    scaler.scale_ = read_hdf5(args.stats, "/" + args.feature_type + "/scale")

    # fail fast with a readable message instead of a shape error deep in
    # the model: the aux width the generator will emit is the feature dim
    # (== stats dim) plus one speaker-code column when enabled (the
    # reference has the same implicit contract and the same failure mode,
    # `wavenet_vocoder/bin/train.py:125-128` vs `:438`)
    expected_aux = int(np.asarray(scaler.mean_).reshape(-1).shape[0]) \
        + int(bool(args.use_speaker_code))
    if args.n_aux != expected_aux:
        logging.error(
            "--n_aux %d does not match the data: stats cover %d feature "
            "dims%s => n_aux must be %d.", args.n_aux, expected_aux -
            int(bool(args.use_speaker_code)),
            " + 1 speaker-code column" if args.use_speaker_code else "",
            expected_aux)
        sys.exit(1)

    # data lists
    if os.path.isdir(args.waveforms):
        filenames = sorted(find_files(args.waveforms, "*.wav", use_dir_name=False))
        wav_list = [args.waveforms + "/" + f for f in filenames]
        feat_list = [args.feats + "/" + f.replace(".wav", ".h5") for f in filenames]
    elif os.path.isfile(args.waveforms):
        wav_list = read_txt(args.waveforms)
        feat_list = read_txt(args.feats)
    else:
        logging.error("--waveforms should be directory or list.")
        sys.exit(1)
    assert len(wav_list) == len(feat_list)
    logging.info("number of training data = %d.", len(wav_list))

    # multi-host: wire the processes together when a coordinator is
    # configured (env/SLURM); no-op in the common single-host case.
    # Runs BEFORE the generator so the corpus can be strided per process.
    from pytorchwavenetvocoder_tpu.parallel import (
        initialize_distributed,
        make_global_mesh,
        shard_global_batch,
    )

    multihost = initialize_distributed()

    # mesh / step.  Utterance-batch mode (--batch_length 0) always
    # yields B=1 (reference semantics), so that is the batch size the
    # mesh must divide — not the ignored --batch_size.
    effective_bs = args.batch_size if args.batch_length > 0 else 1
    mesh = None
    if multihost and jax.process_count() > 1:
        mp = max(args.model_parallel, 1)
        if jax.local_device_count() % mp != 0:
            logging.error("--model_parallel %d must divide the %d local "
                          "devices (model groups must not straddle hosts).",
                          mp, jax.local_device_count())
            sys.exit(1)
        if mp > 1 and args.fused == "true":
            logging.error("--fused true is incompatible with "
                          "--model_parallel > 1 (the fused Pallas kernels "
                          "are single-chip programs).")
            sys.exit(1)
        mesh = make_global_mesh(model_parallel=mp)
        n_devices = jax.device_count()
        if effective_bs % (n_devices // mp) != 0:
            logging.error("batch size %d (1 in utterance mode) must divide "
                          "the %d-device data axis of the global mesh.",
                          effective_bs, n_devices // mp)
            sys.exit(1)
        logging.info("multi-host mesh: %d processes, %d devices%s.",
                     jax.process_count(), n_devices,
                     f", model_parallel={mp}" if mp > 1 else "")
    else:
        n_devices = args.n_devices
        avail = len(jax.devices())
        if n_devices > avail:
            logging.warning("requested %d devices but only %d available.",
                            n_devices, avail)
            n_devices = avail
        mp = max(args.model_parallel, 1)
        if mp > 1:
            # tensor parallelism was explicitly requested: misfits are
            # errors, not silent fallbacks
            if n_devices % mp != 0:
                logging.error("--model_parallel %d must divide the %d "
                              "devices.", mp, n_devices)
                sys.exit(1)
            if effective_bs % (n_devices // mp) != 0:
                logging.error("batch size %d (1 in utterance mode) must "
                              "divide the %d-device data axis "
                              "(n_devices/model_parallel).",
                              effective_bs, n_devices // mp)
                sys.exit(1)
            if args.fused == "true":
                logging.error("--fused true is incompatible with "
                              "--model_parallel > 1 (the fused Pallas "
                              "kernels are single-chip programs).")
                sys.exit(1)
            mesh = make_mesh(n_devices, model_parallel=mp)
        elif n_devices > 1:
            if effective_bs % n_devices != 0:
                logging.warning("batch size %d not divisible by %d devices; "
                                "falling back to single device.",
                                effective_bs, n_devices)
                n_devices = 1
            else:
                mesh = make_mesh(n_devices)

    # multi-host: stride the corpus so each process loads and transforms
    # ONLY its own rows of the global batch (producing the full batch
    # everywhere and slicing wastes (n-1)/n of the host I/O the prefetch
    # thread exists to hide); gradients pmean across hosts regardless
    gen_wav, gen_feat = wav_list, feat_list
    gen_batch_size = args.batch_size
    if mesh is not None and multihost and jax.process_count() > 1:
        pid, np_ = jax.process_index(), jax.process_count()
        gen_wav, gen_feat = wav_list[pid::np_], feat_list[pid::np_]
        if not gen_wav:
            logging.error("fewer training files (%d) than processes (%d).",
                          len(wav_list), np_)
            sys.exit(1)
        # exact by construction: the mesh check above guarantees
        # batch_size is a multiple of the data axis, which process_count
        # divides (each host contributes whole data-axis row blocks)
        gen_batch_size = args.batch_size // np_

    generator = train_generator(
        gen_wav, gen_feat,
        receptive_field=config.receptive_field,
        batch_length=args.batch_length if args.batch_length > 0 else None,
        batch_size=gen_batch_size,
        feature_type=args.feature_type,
        wav_transform=lambda x: encode_mu_law(x, args.n_quantize),
        feat_transform=feature_transform(
            scaler, n_extra=int(bool(args.use_speaker_code))),
        shuffle=True,
        upsampling_factor=args.upsampling_factor,
        use_upsampling_layer=args.use_upsampling_layer,
        use_speaker_code=args.use_speaker_code,
        seed=args.seed,
    )
    if args.remat == "auto":
        if args.batch_length <= 0:
            # utterance-batching mode: lengths are unbounded (a 10 s
            # utterance is 160k samples) — checkpoint defensively
            remat = True
        else:
            per_dev = args.batch_size * args.batch_length
            remat = per_dev // max(n_devices, 1) > 30000
    else:
        remat = args.remat == "true"
    if remat:
        logging.info("remat enabled (large per-device batch).")
    fused = {"auto": None, "true": True, "false": False}[args.fused]
    step_fn = make_train_step(config, lr=args.lr,
                              weight_decay=args.weight_decay, mesh=mesh,
                              remat=remat, fused=fused)

    state = create_train_state(jax.random.PRNGKey(args.seed), config,
                               lr=args.lr, weight_decay=args.weight_decay)
    iterations = 0
    resume = args.resume
    if resume == "latest":
        from pytorchwavenetvocoder_tpu.parallel import find_latest_checkpoint

        resume = find_latest_checkpoint(args.expdir)
        if resume is None:
            logging.info("no checkpoint in %s; starting fresh.", args.expdir)
    if resume is not None and len(resume) != 0:
        state = restore_train_state(resume, state)
        iterations = int(state.step)
        logging.info("restored from %d-iter checkpoint.", iterations)
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from pytorchwavenetvocoder_tpu.parallel import shard_state

        # distribute the layer weights + Adam moments over the model axis
        state = shard_state(mesh, state)

    import jax.numpy as jnp

    # the loss accumulates ON DEVICE and is fetched once per --intervals:
    # a per-step float(loss) would synchronize every iteration, defeating
    # XLA async dispatch and making the background prefetch decorative
    debug_loss = logging.getLogger().isEnabledFor(logging.DEBUG)
    loss_acc = jnp.zeros((), jnp.float32)
    interval_start = time.time()
    n_in_interval = 0
    profiling = False
    for i in range(iterations, args.iters):
        if args.profile_dir and i == iterations + 10:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        if args.profile_dir and i == iterations + 20:
            jax.profiler.stop_trace()
            profiling = False
            logging.info("profiler trace written to %s", args.profile_dir)
        (batch_x, batch_h), batch_t = next(generator)
        if args.batch_length <= 0:
            # utterance mode: pad to a length bucket so XLA compiles a
            # handful of shapes instead of one per distinct utterance
            # length (pad targets are -1, excluded by masked_ce_loss)
            batch_x, batch_h, batch_t = _pad_utterance_batch(
                batch_x, batch_h, batch_t, config.upsampling_factor)
        if mesh is not None and multihost and jax.process_count() > 1:
            # each process's generator yields its own disjoint rows of
            # the global batch (the corpus is strided above)
            batch_x, batch_h, batch_t = shard_global_batch(
                mesh, (batch_x, batch_h, batch_t))
        elif mesh is not None:
            batch_x, batch_h, batch_t = shard_batch(
                mesh, (batch_x, batch_h, batch_t))
        state, loss = step_fn(state, batch_x, batch_h, batch_t)
        loss_acc = loss_acc + loss  # device-side add; no host sync
        n_in_interval += 1
        if debug_loss:  # opt-in: forces a sync per step
            logging.debug("batch loss = %.3f", float(loss))

        if (i + 1) % args.intervals == 0:
            avg_loss = float(loss_acc) / n_in_interval  # one sync per interval
            avg = (time.time() - interval_start) / n_in_interval
            remaining = int((args.iters - (i + 1)) * avg)
            logging.info("(iter:%d) average loss = %.6f (%.3f sec / batch)",
                         i + 1, avg_loss, avg)
            logging.info("estimated required time = %02d:%02d:%02d:%02d",
                         remaining // 86400, (remaining // 3600) % 24,
                         (remaining // 60) % 60, remaining % 60)
            loss_acc = jnp.zeros((), jnp.float32)
            interval_start = time.time()
            n_in_interval = 0

        if (i + 1) % args.checkpoint_interval == 0:
            if jax.process_index() == 0:  # params replicated: one writer
                save_checkpoint(args.expdir, state, iterations=i + 1)

    if profiling:
        # fewer than 10 iterations remained after the trace started:
        # flush it so the trace is usable rather than silently lost
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", args.profile_dir)

    if jax.process_index() == 0:
        save_checkpoint(args.expdir, state, final=True)
        logging.info("final checkpoint created.")


if __name__ == "__main__":
    main()
