"""Test substrate: the CPU backend with 8 virtual devices stands in for a TPU mesh
(the reference's analogous discipline: headless/threadless property tests, SURVEY.md §4).

Note: this environment's axon TPU plugin ignores JAX_PLATFORMS, so the legacy
JAX_PLATFORM_NAME + an explicit config update are both applied."""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
