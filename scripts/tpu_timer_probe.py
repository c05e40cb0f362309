"""Timer forensics: the profiler device lane says gstream = 1037us/call but
_timeit_in_graph says 1733us.  Suspect: the per-iteration perturbation of an
input that the pallas call reads forces XLA to copy that array every
iteration (copy-for-in-place-update hazard on an opaque custom call).

Variants:
  T1 standard timer (perturbs smallest input)
  T3 perturb the LARGEST input instead (if copies happen, dt grows with size)
  T6 perturb smallest, but chain through a DONATED carry scalar only:
     inputs loop-invariant, chain = acc feeds a 0-weight dummy added to the
     index used by _select... (hoisting risk checked via k-scaling)
  T4 host loop x30 with single block_until_ready (profiler-style)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_in_graph)
from feinsum_tpu.tuning.impls._common import fused_pallas_program

E = 1_000_000


def variant_timer(fn, arrays, perturb_name):
    names = sorted(arrays)

    def body(i, carry):
        arrs, acc = carry
        outs = fn(arrs)
        outs = jax.lax.optimization_barrier(tuple(outs))
        probe = outs[0].ravel()[0].astype(jnp.float32)
        acc = acc * 0.5 + probe
        eps = (acc * jnp.asarray(1e-45, jnp.float32)).astype(
            arrs[perturb_name].dtype)
        pert = dict(arrs)
        flat_idx = (0,) * pert[perturb_name].ndim
        pert[perturb_name] = arrs[perturb_name].at[flat_idx].add(eps)
        return pert, acc

    @jax.jit
    def run(arrs, k):
        arrs, acc = jax.lax.fori_loop(0, k, body, (arrs, jnp.float32(0)),
                                      unroll=False)
        outs = jax.lax.optimization_barrier(tuple(fn(arrs)))
        return acc + outs[0].ravel()[0].astype(jnp.float32)

    def timed(k, reps=3):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(arrays, k))
            vals.append(time.perf_counter() - t0)
        return sorted(vals)[len(vals) // 2]

    _ = float(run(arrays, 1))
    t1 = timed(8)
    t2 = timed(64)
    return (t2 - t1) / 56


def host_loop(fn, arrays, n=30):
    out = fn(arrays)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(arrays)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def study(label, e, tr):
    p = tr(f.generate_program(e))
    arrays = _apply_layouts(p, generate_input_arrays(e, long_dim_length=E))
    fn = f.build_executable(p, long_dim_length=E)
    names = sorted(arrays, key=lambda n: arrays[n].size)
    t1 = _timeit_in_graph(fn, arrays)
    t3 = variant_timer(fn, arrays, names[-1])     # largest
    t3s = variant_timer(fn, arrays, names[0])     # smallest (≈T1 rebuilt)
    t4 = host_loop(fn, arrays)
    print(f"{label}: T1={t1*1e6:6.0f} T1'={t3s*1e6:6.0f}"
          f" T3(big={names[-1]})={t3*1e6:6.0f} T4host={t4*1e6:6.0f} us",
          flush=True)


gstream = f.einsum("xre,ei->xei", f.array("J", (3, 3, "E"), "float32"),
                   f.array("u", ("E", 35), "float32"))
study("gstream b8192", gstream,
      lambda p: fused_pallas_program(p, block_long=8192, hoist=False,
                                     parallel_grid=True, dofmajor=True))

copy2 = f.einsum("ij,ij->ij", f.array("A", ("E", 35), "float32"),
                 f.array("B", ("E", 35), "float32"))
study("copy fold b32768", copy2,
      lambda p: fused_pallas_program(p, block_long=32768, hoist=False,
                                     parallel_grid=False, dofmajor=True,
                                     fold=True))

mass = f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                f.array("M", (35, 35), "float32"),
                f.array("u", ("E", 35), "float32"))
study("mass plain b16384", mass,
      lambda p: fused_pallas_program(p, block_long=16384, hoist=False,
                                     parallel_grid=True, dofmajor=True))

div = f.batched_einsum("es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, 35, 35), "float32"),
      f.array(un, ("E", 35), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
study("div hoist b8192", div,
      lambda p: fused_pallas_program(p, block_long=8192, hoist=True,
                                     parallel_grid=True, dofmajor=True))
print("ALLDONE", flush=True)
