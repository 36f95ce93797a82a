"""Test config: force a pure-CPU 8-device virtual mesh.

The harness boots every interpreter with an `axon` (tunneled-TPU) PJRT
plugin via PYTHONPATH sitecustomize which force-selects the TPU backend
(jax_platforms="axon,cpu").  Tests must never touch the tunnel: we override
jax_platforms to "cpu" *before any backend client is created*, and expose
8 virtual CPU devices for multi-chip sharding tests (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# The axon sitecustomize sets jax_platforms="axon,cpu" programmatically,
# overriding the env var — override it back before first use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU, got " + str(jax.devices()[:2]))

import pytest  # noqa: E402

from fiber_tpu.config import FiberConfig  # noqa: E402

# Two-tier suite (SURVEY.md §4): the default tier must finish in < 5 min
# on a 1-core host; everything that executes reference torch modules or
# trains for multiple minutes is `slow`.  Run all: `pytest tests/`;
# fast tier only: `pytest -m "not slow" tests/`.
_SLOW_MODULES = {
    # reference-executing parity suites (import /root/reference + torch)
    "test_reference_parity", "test_reference_parity_fulldim",
    "test_detection_reference_parity", "test_detection_parity_fulldim",
    "test_eval_reference_parity", "test_voc_lvis_parity",
    "test_contrastive_parity", "test_detection_mlm", "test_vlfuse",
    "test_swin_vl_parity",
    # multi-minute integration / training loops
    "test_quality_loop", "test_detection_trainer", "test_trainer",
    "test_multihost", "test_finetune", "test_retrieval_caption",
    "test_fusion_versions", "test_scst", "test_tp",
}

# Individual stragglers measured > ~30 s of (mostly compile) time on the
# 1-core CI host (round-5 `--durations` audit): demoted so the fast tier
# fits its < 10-min budget.  Each demoted test's subsystem keeps cheaper
# fast-tier coverage in the same module.
_SLOW_TESTS = {
    ("test_nan_debug", "test_nan_dump_and_guard"),
    ("test_detector", "test_detection_loss_finite_and_differentiable"),
    ("test_detector", "test_detection_inference_shapes"),
    ("test_objectives", "test_pretrain_losses_grads_flow"),
    ("test_objectives", "test_pretrain_losses_finite_and_queue_updates"),
    ("test_objectives", "test_itm_hardneg_chunked_grads_flow"),
    ("test_backbone_registry", "test_fbnet_grads_finite"),
    ("test_backbone_registry", "test_efficientnet_bifpn_registry"),
    ("test_backbone_registry", "test_fbnet_trunk_shapes"),
    ("test_caption_cache", "test_greedy_cached_matches_oracle"),
    ("test_caption_cache", "test_beam_cached_matches_oracle"),
    ("test_fiber_model", "test_train_config_remat_droppath_traces"),
    ("test_backbone_zoo", "test_bifpn_shapes_and_grads"),
    ("test_backbone_zoo", "test_swin_v2_backbone"),
    ("test_backbone_zoo", "test_efficientnet_strides"),
}


def pytest_collection_modifyitems(items):
    for item in items:
        mod = item.module.__name__
        name = item.name.split("[")[0]
        if mod in _SLOW_MODULES or (mod, name) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def tiny_cfg():
    return FiberConfig.tiny_test()


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
