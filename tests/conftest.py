"""Force tests onto the XLA CPU backend with an 8-device virtual mesh (the
POCL-on-CI analog, SURVEY.md §4): same code paths as TPU, no TPU required.
Real-TPU runs are gated behind bench.py / examples.

Note: this sandbox's sitecustomize registers the remote-TPU ("axon") PJRT
plugin at interpreter startup and pins JAX_PLATFORMS, so env vars set here are
too late — use jax.config instead, before any computation runs."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
