"""DG wave-operator gradient einsum: validate + time + roofline
(reference: examples/dg_wave_grad.py)."""
import feinsum_tpu as f

NDIM = 3
NDOF = 20  # P3

einsum = f.einsum("xre,rij,ej->xei",
                  f.array("J", (NDIM, NDIM, "E"), "float32"),
                  f.array("D", (NDIM, NDOF, NDOF), "float32"),
                  f.array("u", ("E", NDOF), "float32"))


def variant_0(program):
    """XLA backend with the hoisted (opt_einsum) schedule.  bf16_3x keeps
    f32-oracle accuracy on TPU, where plain f32 dots run as 1-pass bf16."""
    return f.generate_program_with_opt_einsum_schedule(
        program.einsum).with_descriptor(precision="bf16_3x")


def variant_1(program):
    """Fused Pallas kernel: grid over the element axis, all contraction
    steps in VMEM."""
    return f.generate_program_with_opt_einsum_schedule(
        program.einsum).with_descriptor(
            backend="pallas", block_long=4096,
            dimension_semantics="parallel")


def _bench_long_dim():
    import jax
    return 500_000 if jax.devices()[0].platform == "tpu" else 4_000


if __name__ == "__main__":
    for name, variant in [("xla-hoisted", variant_0),
                          ("pallas-fused", variant_1)]:
        print(f"==== {name} ====")
        print(f.stringify_comparison_vs_roofline(
            einsum, transform=variant, long_dim_length=_bench_long_dim(),
            ignore_unknown_device=True))
