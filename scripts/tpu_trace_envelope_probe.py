"""Probe: do device-trace spans under-report bandwidth-bound XLA dots?

tccg_2's fused-2D champion measured 49.7 us/launch via median module span,
but its mandatory 115 MB input stream needs >= ~175 us at the 652 GB/s
measured bus — physically impossible.  Hypothesis: for plain-HLO
executables the "XLA Modules" span excludes async DMA prologues, which
hide in inter-span gaps (pallas calls were verified back-to-back, ~1 us
gaps).  This probe records start timestamps too and compares:
  median span | median start-to-start interval | envelope (last end -
  first start)/n
for (a) the tccg_2 champion (suspect), (b) the tccg_35 champion, (c) a
pallas DG kernel (control).
"""
import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f
from feinsum_tpu.measure import _apply_layouts, generate_input_arrays
from feinsum_tpu.tuning import get_transform_func_from_module_path

N_ITERS = 30


def spans_of(fn, arrays):
    out = fn(arrays)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="feinsum_envelope_")
    with jax.profiler.trace(d):
        for _ in range(N_ITERS):
            out = fn(arrays)
        jax.block_until_ready(out)
    files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(files)[-1]) as fh:
        tr = json.load(fh)
    evs = tr.get("traceEvents", [])
    threads, device_pids = {}, set()
    for e in evs:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" \
                and "device:" in str(e.get("args", {}).get("name", "")):
            device_pids.add(e["pid"])
        if e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    groups = defaultdict(list)
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if threads.get((e["pid"], e.get("tid"))) != "XLA Modules":
            continue
        groups[e.get("name", "?")].append(
            (float(e.get("ts", 0.0)), float(e.get("dur", 0.0))))
    return {k: sorted(v) for k, v in groups.items()
            if len(v) >= max(3, int(0.8 * N_ITERS))}


def report(label, fn, arrays, gbytes):
    try:
        groups = spans_of(fn, arrays)
    except Exception as ex:
        print(f"{label}: FAIL {type(ex).__name__} {str(ex)[:160]}",
              flush=True)
        return
    for name, sv in groups.items():
        durs = sorted(d for _, d in sv)
        med = durs[len(durs) // 2]
        starts = [t for t, _ in sv]
        iv = sorted(np.diff(starts))
        med_iv = iv[len(iv) // 2] if iv else float("nan")
        env = (sv[-1][0] + sv[-1][1] - sv[0][0]) / len(sv)
        print(f"{label} [{name[:40]}] n={len(sv)}: span {med:8.1f} us"
              f" ({gbytes*1e3/med:6.0f} GB/s) | start-iv {med_iv:8.1f}"
              f" ({gbytes*1e3/med_iv:6.0f}) | envelope {env:8.1f}"
              f" ({gbytes*1e3/env:6.0f})", flush=True)


def build(einsum, impl, **params):
    tr = get_transform_func_from_module_path(impl).bind_args(einsum, **params)
    prog = tr(f.generate_program(einsum))
    fn = f.build_executable(prog, long_dim_length=1_000_000)
    arrays = _apply_layouts(prog, generate_input_arrays(
        einsum, long_dim_length=1_000_000))
    return fn, arrays


# (a) tccg_2 champion: xla 3x swap=True
e2 = f.get_tccg_benchmark(2, dtype="float32")
fn, arrays = build(e2, "tc_gemm_v0", log2_block=10, blkc128=0,
                   backend_pallas=False, precision_idx=1, swap=True,
                   dofmajor=False, fold=False, vmem_idx=2)
gb2 = sum(v.size * 4 for v in arrays.values()) / 1e9 + 312 * 296 * 24 * 4 / 1e9
report("tccg_2 xla3x", fn, arrays, gb2)

# (b) tccg_35 champion: xla 3x swap=False
e35 = f.get_tccg_benchmark(35, dtype="float32")
fn, arrays = build(e35, "tc_gemm_v0", log2_block=10, blkc128=0,
                   backend_pallas=False, precision_idx=1, swap=False,
                   dofmajor=False, fold=False, vmem_idx=2)
gb35 = sum(v.size * 4 for v in arrays.values()) / 1e9 + 6144 * 6144 * 4 / 1e9
report("tccg_35 xla3x", fn, arrays, gb35)

# (b2) tccg_35 pallas champion (control in the same shape class)
fn, arrays = build(e35, "tc_gemm_v0", log2_block=10, blkc128=0,
                   backend_pallas=True, precision_idx=1, swap=False,
                   dofmajor=True, fold=False, vmem_idx=2)
report("tccg_35 pallas3x", fn, arrays, gb35)

# (c) pallas DG control: mass ndof=35 at E=1M
mass = f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                f.array("M", (35, 35), "float32"),
                f.array("u", ("E", 35), "float32"))
fn, arrays = build(mass, "mass_v0", log2_block=14, blkc128=0, dofmajor=True,
                   fold=True, preblock=False, precision_3x=False,
                   parallel_grid=True, vmem_idx=2, split_rows=0,
                   accum_f32=0)
gbm = sum(v.size * 4 for v in arrays.values()) / 1e9 + 1_000_000 * 35 * 4 / 1e9
report("mass35 pallas", fn, arrays, gbm)
print("ALLDONE", flush=True)
