import os
import resource

# Raise the main-thread C-stack soft limit (8 MB default): the full suite
# deterministically SEGFAULTed in XLA:CPU while compiling the traj
# pipeline's scanned denoise late in the run (the same test passes
# standalone and in small combinations — accumulated stack/heap state
# pushes a deep XLA pass over the 8 MB soft limit). The hard limit is
# unlimited here; 64 MB is comfortably above XLA's worst observed depth.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    if _soft != resource.RLIM_INFINITY and _soft < 64 * 1024 * 1024:
        resource.setrlimit(resource.RLIMIT_STACK,
                           (64 * 1024 * 1024, _hard))
except (ValueError, OSError):  # pragma: no cover - restrictive sandboxes
    pass

# 8-way virtual CPU mesh (the standard JAX substitute for a multi-chip slice).
# NOTE: this environment force-registers an 'axon' (tunneled TPU) platform via
# site config that overrides JAX_PLATFORMS, so we must override through
# jax.config BEFORE the backend initializes — eager ops on the tunneled TPU
# are network round-trips and make tests pathologically slow.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite deterministically SEGFAULTed inside XLA:CPU while
    compiling the traj scanned denoise at test #169 — reproducible at the
    same test across three full runs yet absent from every <=60-test
    subset (both bisection halves pass), i.e. a CUMULATIVE-state failure:
    ~170 live jitted executables' LLVM JIT code segments before a very
    large new compile. Dropping compiled programs between modules caps
    that accumulation; within-module cache reuse (where programs are
    actually shared) is unaffected."""
    yield
    jax.clear_caches()


# ---- fast/slow tiers -------------------------------------------------------
# `pytest -m fast` is the <10-min tier (quick pre-commit signal on the
# 1-core CPU of this environment); the unmarked remainder is the full
# ~2 h tier (XLA:CPU compile dominates — see CLAUDE.md). Tier membership
# is by MODULE, from the measured per-module wall times of the r05 full
# run (TESTS_r05.txt): every module whose total is under ~45 s is fast.
FAST_MODULES = {
    # per-module wall s from the r05 full run (TESTS_r05.txt); all <=63 s,
    # tier total ~9 min
    "test_native", "test_panels", "test_flow_datasets", "test_preprocess",
    "test_euler", "test_ui_server", "test_face3d_render", "test_checkpoint",
    "test_sharded_dispatch", "test_resize", "test_ops_misc", "test_mp_face",
    "test_parity_primitives", "test_geglu_ffn", "test_group_norm_kernel",
    "test_softsplat", "test_gfpgan", "test_conv_fused",
    "test_flash_attention", "test_face3d_fit", "test_film",
    "test_audio_models", "test_sadtalker", "test_face_alignment",
    "test_short_attention",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in FAST_MODULES:
            item.add_marker(_pytest.mark.fast)
