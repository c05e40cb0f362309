"""Probe: what can this v5e actually do in float64?  The device table's
3.9 TF entry is spec-derived; bench r2 measured the fp64 div row at
6 GOp/s (0.2%), so either the XLA f64 matmul path is pathological or the
honest f64 ceiling is orders of magnitude below the table.  Measure:
elementwise f64 streaming, f64 matmuls at several sizes, and the div class
trivial vs opt path."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import feinsum_tpu as f
from feinsum_tpu.measure import (generate_input_arrays, _apply_layouts,
                                 _timeit_device_trace, get_footprint_gbytes)


def dt_of(fn, arrays):
    return _timeit_device_trace(fn, arrays)


# 1) f64 streaming: copy-add at E=8M
E = 8_000_000
a = jnp.arange(E, dtype=jnp.float64)
b = jnp.ones(E, dtype=jnp.float64)
add = jax.jit(lambda d: d["a"] + d["b"])
dt = dt_of(add, {"a": a, "b": b})
print(f"f64 elementwise add E=8M: {3*8*E/dt/1e9:6.1f} GB/s | {dt*1e6:7.0f} us",
      flush=True)

# 2) f64 matmul rates
for n in (256, 1024, 2048):
    x = jnp.ones((n, n), jnp.float64)
    y = jnp.ones((n, n), jnp.float64)
    mm = jax.jit(lambda d: jnp.dot(d["x"], d["y"],
                                   precision=jax.lax.Precision.HIGHEST))
    dt = dt_of(mm, {"x": x, "y": y})
    print(f"f64 matmul {n}^3: {2*n**3/dt/1e9:8.1f} GFLOP/s | {dt*1e6:8.0f} us",
          flush=True)

# 2b) f32 matmul same size for scale
x = jnp.ones((2048, 2048), jnp.float32)
mm32 = jax.jit(lambda d: jnp.dot(d["x"], d["x"],
                                 precision=jax.lax.Precision.HIGHEST))
dt = dt_of(mm32, {"x": x})
print(f"f32 matmul 2048^3 (HIGHEST): {2*2048**3/dt/1e9:8.1f} GFLOP/s",
      flush=True)

# 3) div fp64 via XLA: trivial vs opt path at E=200k
def make_div64():
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(jn, ("E", 3), "float64"),
          f.array("R", (3, 35, 35), "float64"),
          f.array(un, ("E", 35), "float64")]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


E2 = 200_000
for label, mk in [
        ("trivial", lambda p: f.generate_program(p.einsum).with_descriptor(
            backend="xla", precision="highest")),
        ("optpath", lambda p: f.generate_program_with_opt_einsum_schedule(
            p.einsum).with_descriptor(backend="xla", precision="highest")),
        ("default-prec", lambda p: f.generate_program(p.einsum)
         .with_descriptor(backend="xla", precision="fastest"))]:
    try:
        t0 = time.time()
        e64 = make_div64()
        p = mk(f.generate_program(e64))
        arrays = _apply_layouts(p, generate_input_arrays(
            e64, long_dim_length=E2))
        fn = f.build_executable(p, long_dim_length=E2)
        dt = dt_of(fn, arrays)
        gb = get_footprint_gbytes(e64, long_dim_length=E2)
        print(f"div64 {label}: {gb/dt:6.1f} GB/s eff | {dt*1e6:8.0f} us"
              f" | wall {time.time()-t0:.0f}s", flush=True)
    except Exception as ex:
        print(f"div64 {label}: FAIL {type(ex).__name__} {str(ex)[:140]}",
              flush=True)
print("ALLDONE", flush=True)
