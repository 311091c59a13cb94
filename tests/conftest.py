"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); real-TPU paths are exercised
by bench.py / the driver instead.
"""

import os

import pytest

# ---------------------------------------------------------------------------
# Test tiers.  The full suite takes ~12 min on this host; the tests below
# (measured >= ~8 s each: interpret-mode Pallas equivalence, torch e2e
# fidelity training, 2-process multihost CLI, long-utterance device DSP)
# carry the `slow` marker so a quick all-component pass stays cheap:
#
#     pytest -m "not slow" -n 4      # quick tier, ~1-2 min
#     pytest tests/                  # full suite (default, unchanged)
#
# Whole slow FILES are in _SLOW_FILES; individual tests in _SLOW_TESTS
# (bare names — parametrized variants can override via full node ids in
# _QUICK_IDS to keep one cheap variant in the quick tier).
# ---------------------------------------------------------------------------
_SLOW_FILES = {"test_e2e_fidelity.py", "test_multihost_cli.py"}
_SLOW_TESTS = {
    "test_long_utterance_tail_precision",
    "test_many_matches_single_and_buckets_lengths",
    "test_vibrato_tracking",
    "test_steady_tone_accuracy",
    "test_mcd_power_threshold_skips_silence",
    "test_eval_mcd_cli",
    "test_mcd_dtw_absorbs_drift",
    "test_mcd_orders_by_similarity",
    "test_mcd_shift_tolerance",
    "test_eval_mcd_cli_identical_is_zero",
    "test_pallas_matches_scan_argmax",
    "test_pallas_deeper_dilations",
    "test_pallas_kernel3_matches_scan",
    "test_pallas_int8_close_to_bf16",
    "test_pallas_int8_close_to_scan_argmax",
    "test_pallas_mesh_generate_matches_scan",
    "test_feature_extract_cli_f0_device_jax",
    "test_fused_backward_odd_batch_and_tiles",
    "test_fused_forward_bit_exact_at_1024_tile",
    "test_fused_backward_matches_autodiff",
    "test_mesh_fused_shardmap_matches_single",
    "test_full_cli_pipeline",
    # round-4 trim (measured >=28 s each on the 1-core host); every one
    # has a cheaper sibling still in the quick tier covering the same
    # subsystem (train flags / torch conversion / device Harvest)
    "test_remat_flag_produces_identical_loss",
    "test_noise_is_unvoiced",
    "test_convert_checkpoint_cli_to_torch_round_trip",
    "test_optimizer_moments_round_trip_for_resume",
    "test_matches_host_on_modulated_harmonics",
    "test_bf16_intermediates_matches_f32",
    "test_narrow_f0_range_small_channel_bank",
}
# cheap parametrized variants kept in the quick tier for coverage
_QUICK_IDS = {
    "test_ar_kernel.py::test_pallas_matches_scan_argmax[4]",
    "test_train_kernel.py::test_fused_backward_matches_autodiff[3]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        base = item.name.split("[")[0]
        node = f"{fname}::{item.name}"
        if node in _QUICK_IDS:
            continue
        if fname in _SLOW_FILES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)

# hard-set (not setdefault): the ambient environment exports
# JAX_PLATFORMS=axon (the real TPU), but unit tests must run on the
# virtual CPU mesh, with x64 available for the f64 parity tests.
# WN_TPU_TESTS=1 keeps the real backend so tests/test_tpu_hardware.py
# can exercise the chip (scripts/tpu_learning_smoke.sh sets it).
if os.environ.get("WN_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "true"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    # jax may already be imported by a pytest plugin before this conftest
    # runs, in which case the env vars were read too late — force via config
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    def pytest_ignore_collect(collection_path, config):
        # under WN_TPU_TESTS=1 the CPU-suite assumptions (x64, 8 virtual
        # devices) don't hold — collect ONLY the hardware tests so a bare
        # `WN_TPU_TESTS=1 pytest tests/` does the right thing
        return (collection_path.name.startswith("test_")
                and collection_path.name != "test_tpu_hardware.py")
