"""
Static per-device peak tables for roofline modeling
(parity: reference ``feinsum/data/device_info.py:5-26``).

TPU entries are per-chip numbers.  Matmul peaks for non-native dtypes on TPU
(fp32 runs as multi-pass bf16 on the MXU under the default XLA precision
config) are derated from the bf16 MXU peak; entries marked "measured" were
calibrated with microbenchmarks on the actual hardware (see
``feinsum_tpu/measure.py:calibrate_device_peaks``).  GPU entries mirror the
reference's table so archived reference facts remain interpretable.
"""

from __future__ import annotations

# peak GFLOP/s by dtype
DEV_TO_PEAK_GFLOPS = {
    # --- TPU generations (per chip) ---
    "TPU_v4": {
        "bfloat16": 275_000.0,
        "float32": 91_700.0,   # bf16/3 (3-pass split-bf16, oracle-passing)
        "float64": 4_300.0,
    },
    "TPU_v5_lite": {  # v5e; bf16 from spec.  float32 = the 3-pass split-
        # bf16 ceiling (197/3 = 65.7 TF): both XLA's BF16_BF16_F32_X3 dot
        # algorithm and our manual bf16_3x pass the f32 validation oracle
        # (~2^-21 relative), and a 5136^3 GEMM measured 62.6 TF = 95% of it
        # (bench r2, tccg_12) — so 3-pass, not 6-pass HIGHEST (31.3 TF
        # measured), is the honest f32 peak.  Default-precision 1-pass bf16
        # (~156 TF measured) fails the oracle and does not count.
        "bfloat16": 197_000.0,
        "float32": 65_700.0,
        # no f64 hardware: XLA emulates doubles in f32-pair arithmetic.
        # MEASURED matmul ceiling 1.77 TF (1024^3, scripts/tpu_f64_probe.py);
        # the old 3.9 TF entry was spec-derived fantasy.  Beware: f64
        # einsums with >2 operands can blow up in 4.9x-padded emulation
        # temps (div @ E=1M wants 28.9 GB of HBM decomposed) — see
        # CLAUDE.md round-2 findings.
        "float64": 1_770.0,
    },
    "TPU_v5": {  # v5p
        "bfloat16": 459_000.0,
        "float32": 153_000.0,  # bf16/3
        "float64": 7_200.0,
    },
    "TPU_v6_lite": {  # Trillium / v6e
        "bfloat16": 918_000.0,
        "float32": 306_000.0,  # bf16/3
        "float64": 14_300.0,
    },
    # --- reference GPUs (from the reference's table) ---
    "NVIDIA_TITAN_V": {
        "float32": 12_288.0,
        "float64": 6_144.0,
        "complex64": 12_288.0,
        "complex128": 6_144.0,
    },
    "NVIDIA_GEFORCE_GTX_1650": {
        "float32": 3_916.8,
        "float64": 122.4,
    },
    "NVIDIA_H200_NVL": {
        "float32": 67_000.0,
        "float64": 34_000.0,
    },
}

# peak HBM bandwidth, GB/s
DEV_TO_PEAK_BW = {
    "TPU_v4": 1_228.0,
    "TPU_v5_lite": 819.0,
    "TPU_v5": 2_765.0,
    "TPU_v6_lite": 1_640.0,
    "NVIDIA_TITAN_V": 652.8,
    "NVIDIA_GEFORCE_GTX_1650": 192.0,
    "NVIDIA_H200_NVL": 4_800.0,
}

# peak HBM *write-drain* bandwidth, GB/s — only for devices where it was
# MEASURED: a pure streaming-store saturates below the mixed read+write bus
# peak (v5e: 652 vs 819, scripts/tpu_stream_probe.py / tpu_tc2_probe.py).
# Write-dominated kernels (expansion-heavy TCCG outputs) are bounded by
# this, not the bus peak; the roofline model adds the term where known.
DEV_TO_PEAK_WRITE_BW = {
    "TPU_v5_lite": 652.0,
}

# VMEM per core, bytes (used by schedule-space guards, the TPU analog of the
# reference impls' shared-memory-<=48kB InvalidParameterError guards)
DEV_TO_VMEM_BYTES = {
    "TPU_v4": 128 * 1024 * 1024,
    "TPU_v5_lite": 128 * 1024 * 1024,
    "TPU_v5": 128 * 1024 * 1024,
    "TPU_v6_lite": 128 * 1024 * 1024,
}
DEFAULT_VMEM_BYTES = 64 * 1024 * 1024


def sanitize_device_name(name: str) -> str:
    """'TPU v5 lite' -> 'TPU_v5_lite' (reference sql_utils.py:122-132)."""
    return name.strip().replace(" ", "_").replace("-", "_")


def get_device_key(device=None) -> str:
    """Roofline-table key for *device* (a jax Device, a str, or anything with
    ``.device_kind``/``.name``); defaults to jax's first device."""
    if device is None:
        import jax
        device = jax.devices()[0]
    if isinstance(device, str):
        return sanitize_device_name(device)
    kind = getattr(device, "device_kind", None) or getattr(device, "name", "")
    return sanitize_device_name(str(kind))
