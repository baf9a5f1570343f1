"""Test config: force the JAX CPU backend with 8 virtual devices so
sharding tests run the same pjit programs a TPU slice would
(SURVEY.md §4: xla_force_host_platform_device_count).

Note: the environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon);
``jax.config.update("jax_platforms", ...)`` after import is what reliably
overrides it, so we do both.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# XLA fallback paths on CPU; Pallas kernel tests opt in via interpret=True
os.environ.setdefault("TPU_LLM_DISABLE_PALLAS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the CPU test backend: the heavy
# shard_map compiles (PP x TP parity: ~157s; the full suite: ~12 min of
# compile) hit disk on every run after the first. Entries key on the
# full HLO + options, so stale hits are impossible.
from tpu_llm.runtime.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.expanduser("~/.cache/tpu_llm/xla-cpu-tests")
)
