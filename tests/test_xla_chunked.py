"""The xla_block_long descriptor knob: lax.map over long-axis chunks on the
XLA route (bounds f64-emulation temps; see codegen/program.py
_xla_chunked_fn)."""

import numpy as np
import pytest

import feinsum_tpu as f
from feinsum_tpu.diagnostics import InvalidParameterError
from feinsum_tpu.measure import (
    _apply_layouts,
    _numpy_oracle,
    generate_input_arrays,
)


def make_div(ndof, dtype):
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(j, ("E", 3), dtype),
          f.array("R", (3, ndof, ndof), dtype),
          f.array(u, ("E", ndof), dtype)]
         for j, u in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


def run(prog, e, length, rtol):
    raw = generate_input_arrays(e, long_dim_length=length, as_numpy=True)
    arrays = _apply_layouts(prog, {k: np.asarray(v) for k, v in raw.items()})
    fn = f.build_executable(prog, long_dim_length=length)
    outs = fn(arrays)
    for o, r in zip(outs, _numpy_oracle(e, raw)):
        got = np.asarray(o)
        if prog.descriptor.out_layout is not None:
            got = np.transpose(got, np.argsort(prog.descriptor.out_layout))
        np.testing.assert_allclose(got, r, rtol=rtol,
                                   atol=rtol * np.abs(r).max())


def test_chunked_f64_div_matches_oracle():
    e = make_div(7, "float64")
    prog = f.generate_program_with_opt_einsum_schedule(e).with_descriptor(
        backend="xla", precision="highest", xla_block_long=256)
    run(prog, e, 1024, 1e-12)


def test_chunk_pads_non_divisible_length():
    # 1000 is not divisible by the requested 256: the builder zero-pads the
    # tail chunk and slices the output (it must NOT degenerate to tiny
    # divisor blocks — ADVICE r2)
    e = make_div(5, "float32")
    prog = f.generate_program(e).with_descriptor(
        backend="xla", precision="highest", xla_block_long=256)
    run(prog, e, 1000, 2e-5)


def test_chunk_prime_length_keeps_block_size():
    # a prime length used to collapse blk to 1 (~length sequential chunks);
    # now it pads: still correct, and the chunk count stays bounded
    e = make_div(4, "float64")
    prog = f.generate_program(e).with_descriptor(
        backend="xla", precision="highest", xla_block_long=128)
    run(prog, e, 997, 1e-12)


def test_chunked_respects_out_layout():
    e = f.einsum("xre,rij,ej->xei",
                 f.array("J", (3, 3, "E"), "float32"),
                 f.array("D", (3, 5, 5), "float32"),
                 f.array("u", ("E", 5), "float32"))
    prog = f.generate_program(e).with_descriptor(
        backend="xla", precision="highest", xla_block_long=128,
        out_layout=(0, 2, 1))
    run(prog, e, 512, 2e-5)


def test_chunked_rejects_no_long_axis():
    e = f.get_tccg_benchmark(12, dtype="float32")
    prog = f.generate_program(e).with_descriptor(
        backend="xla", xla_block_long=64)
    with pytest.raises(InvalidParameterError):
        f.build_executable(prog, long_dim_length=100)


def test_xla_v0_space_exposes_chunking():
    from feinsum_tpu.tuning import get_transform_func_from_module_path
    e = make_div(5, "float64")
    sp = get_transform_func_from_module_path("xla_v0")
    tr = sp.bind_args(e, use_opt_path=True, precision_idx=1, log2_chunk=8)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=1024)
