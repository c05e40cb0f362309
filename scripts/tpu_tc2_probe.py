"""Probe: where do the expansion-heavy TCCG microseconds go?

tccg_35's TTGT-natural form is a GEMM (M=6144, K=24, N=6144) whose 151 MB
output should stream at bus rate (~250 us) but measures 3505 us end to end.
Hypotheses: (a) XLA's GEMM tiling collapses at tiny K; (b) our own
matvec-family Pallas kernel (resident (N,K) matrix, grid over M) reaches the
write ceiling.  Also isolates tccg_21's GEMM (5184^3) from its transposes.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import _apply_layouts, _timeit_device_trace
from feinsum_tpu.tuning import get_transform_func_from_module_path


def bench(label, fn, arrays, gbytes, gops=None):
    t0 = time.time()
    try:
        dt = _timeit_device_trace(fn, arrays)
        extra = f" | {gops/dt:8.0f} GOp/s" if gops else ""
        print(f"{label}: {dt*1e6:8.0f} us | {gbytes/dt:6.0f} GB/s{extra}"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"{label}: FAIL {type(ex).__name__} {str(ex)[:160]}", flush=True)


rng = np.random.default_rng(0)
M = N = 6144
K = 24

A = jnp.asarray(rng.random((M, K)), jnp.float32)
B = jnp.asarray(rng.random((K, N)), jnp.float32)
out_gb = M * N * 4 / 1e9
io_gb = out_gb + (M * K + K * N) * 4 / 1e9
gops = 2 * M * N * K / 1e9

for prec in ("highest", "default"):
    bench(f"xla dot K24 {prec}",
          jax.jit(lambda d, p=prec: jnp.dot(d["a"], d["b"], precision=p)),
          {"a": A, "b": B}, io_gb, gops)

# 3-pass manual split (our bf16_3x descriptor mode, straight-line here)
def dot3x(a, b):
    ahi = a.astype(jnp.bfloat16).astype(jnp.float32)
    bhi = b.astype(jnp.bfloat16).astype(jnp.float32)
    alo, blo = a - ahi, b - bhi
    d = lambda x, y: jax.lax.dot(x.astype(jnp.bfloat16),
                                 y.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
    return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)

bench("xla dot K24 bf16_3x", jax.jit(lambda d: dot3x(d["a"], d["b"])),
      {"a": A, "b": B}, io_gb, gops)

# our matvec-family Pallas kernel: einsum "ej,ij->ei", e=M long, j=K, i=N
e = f.einsum("ej,ij->ei",
             f.array("u", ("E", K), "float32"),
             f.array("D", (N, K), "float32"))
matvec = get_transform_func_from_module_path("mass_v0")
arrays0 = {"u": np.asarray(A), "D": np.asarray(B.T)}
for lb, blkc in ((9, 0), (10, 0), (11, 0), (12, 0), (9, 2), (10, 4)):
    for p3x in (True, False):
        try:
            tr = matvec.bind_args(
                e, log2_block=lb, blkc128=blkc, dofmajor=True, fold=True,
                preblock=False, precision_3x=p3x, parallel_grid=True,
                vmem_idx=2, split_rows=0, accum_f32=0)
            p = tr(f.generate_program(e))
            fn = f.build_executable(p, long_dim_length=M)
            arrays = _apply_layouts(p, dict(arrays0))
            bench(f"pallas matvec b{lb}c{blkc}{' 3x' if p3x else ''}",
                  fn, arrays, io_gb, gops)
        except Exception as ex:
            print(f"pallas matvec b{lb}c{blkc} 3x={p3x}: FAIL"
                  f" {type(ex).__name__} {str(ex)[:160]}", flush=True)

# tccg_21 GEMM isolated: 5184^3 f32
M2 = N2 = K2 = 5184
A2 = jnp.asarray(rng.random((M2, K2)), jnp.float32)
B2 = jnp.asarray(rng.random((K2, N2)), jnp.float32)
g2 = 2 * M2 * N2 * K2 / 1e9
io2 = (M2 * K2 + K2 * N2 + M2 * N2) * 4 / 1e9
bench("xla gemm 5184^3 bf16_3x", jax.jit(lambda d: dot3x(d["a"], d["b"])),
      {"a": A2, "b": B2}, io2, g2)
bench("xla gemm 5184^3 default",
      jax.jit(lambda d: jnp.dot(d["a"], d["b"])), {"a": A2, "b": B2},
      io2, g2)

# tccg_21 transposes isolated: aebf (72^4) -> (ab)(ef) flat
x = jnp.asarray(rng.random((72, 72, 72, 72)), jnp.float32)
tp_gb = 2 * x.size * 4 / 1e9
bench("transpose aebf->abef+reshape",
      jax.jit(lambda d: d["t"].transpose(0, 2, 1, 3).reshape(5184, 5184)),
      {"t": x}, tp_gb)
bench("transpose fdec->efdc+reshape",
      jax.jit(lambda d: d["t"].transpose(3, 0, 1, 2).reshape(5184, 5184)),
      {"t": x}, tp_gb)
print("ALLDONE", flush=True)
