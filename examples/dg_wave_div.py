"""DG wave-operator divergence (batched, b=3): validate + time + roofline
(reference: examples/dg_wave_div.py)."""
import feinsum_tpu as f

NDIM = 3
NDOF = 35  # P4

einsum = f.batched_einsum(
    "es,sij,ej->ei",
    [[f.array(jn, ("E", NDIM), "float32"),
      f.array("R", (NDIM, NDOF, NDOF), "float32"),
      f.array(un, ("E", NDOF), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


def variant_1(program):
    return f.generate_program_with_opt_einsum_schedule(
        program.einsum).with_descriptor(
            backend="pallas", block_long=4096,
            dimension_semantics="parallel")


def _bench_long_dim():
    import jax
    return 500_000 if jax.devices()[0].platform == "tpu" else 4_000


if __name__ == "__main__":
    print(f.stringify_comparison_vs_roofline(
        einsum, transform=variant_1, long_dim_length=_bench_long_dim(),
        ignore_unknown_device=True))
