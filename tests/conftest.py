"""Force tests onto the XLA CPU backend with an 8-device virtual mesh (the
POCL-on-CI analog, SURVEY.md §4): same code paths as TPU, no TPU required.
Real-TPU runs are gated behind bench.py / examples."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
