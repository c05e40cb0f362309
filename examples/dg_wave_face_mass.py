"""DG face-mass / lift operator einsum (reference:
examples/dg_wave_face_mass.py)."""
import feinsum_tpu as f

NVOLDOF = 35
NFACEDOF = 15
NFACES = 4

einsum = f.einsum("ifj,fe,fej->ei",
                  f.array("L", (NVOLDOF, NFACES, NFACEDOF), "float32"),
                  f.array("Fj", (NFACES, "E"), "float32"),
                  f.array("flux", (NFACES, "E", NFACEDOF), "float32"))


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
