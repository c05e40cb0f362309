"""Cross-examine the three timing protocols on kernels where bench reported
physically-impossible roofline fractions (rowsum 197%, tccg_02 239% —
measured dt below the HBM-bandwidth floor).

For each suspect kernel print: the raw wall(n) samples and the differenced
estimate, the device-trace median span, the in-graph estimate, and the
bandwidth floor implied by the operand bytes — to identify which protocol
lies and how.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402
from feinsum_tpu.measure import (  # noqa: E402
    _apply_layouts,
    _timeit_device_trace,
    _timeit_in_graph,
    _timeit_wall_diff,
    generate_input_arrays,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def examine(name, einsum, long_dim_length):
    tr = sql_utils.retrieve(einsum)
    prog = tr(f.generate_program(einsum))
    arrays = _apply_layouts(
        prog, generate_input_arrays(einsum,
                                    long_dim_length=long_dim_length))
    fn = f.build_executable(prog, long_dim_length=long_dim_length)
    in_bytes = sum(int(v.size) * v.dtype.itemsize for v in arrays.values())
    floor_us = 1e6 * in_bytes / 819e9

    out = fn(arrays)
    jax.block_until_ready(out)

    def wall(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(arrays)
        o = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.asarray(o).ravel()[0])
        return time.perf_counter() - t0

    samples = {n: [wall(n) for _ in range(3)] for n in (10, 30, 90)}
    for n, ws in samples.items():
        log(f"  {name}: wall({n}) = {[round(1e3 * w, 2) for w in ws]} ms"
            f" -> per-launch {[round(1e6 * w / n, 1) for w in ws]} us")
    d1 = (min(samples[30]) - min(samples[10])) / 20
    d2 = (min(samples[90]) - min(samples[30])) / 60
    dt_wd = _timeit_wall_diff(fn, arrays)
    dt_tr = _timeit_device_trace(fn, arrays)
    dt_ig = _timeit_in_graph(fn, arrays)
    log(f"  {name}: diff(30-10)={1e6 * d1:.1f}us diff(90-30)={1e6 * d2:.1f}us"
        f" | wall_diff={1e6 * dt_wd:.1f}us trace={1e6 * dt_tr:.1f}us"
        f" in_graph={1e6 * dt_ig:.1f}us | input-bytes floor={floor_us:.1f}us")


def main():
    ndof = 35
    examine("rowsum", f.einsum("ej->e", f.array("A", ("E", 35), "float32")),
            1_000_000)
    examine("vecmat", f.einsum("ej,j->e",
                               f.array("A", ("E", 35), "float32"),
                               f.array("x", (35,), "float32")), 1_000_000)
    examine("tccg_02", f.get_tccg_benchmark(2, dtype="float32"), 100_000)
    examine("mass", f.einsum("e,ij,ej->ei",
                             f.array("jac", ("E",), "float32"),
                             f.array("M", (ndof, ndof), "float32"),
                             f.array("u", ("E", ndof), "float32")),
            1_000_000)


if __name__ == "__main__":
    main()
