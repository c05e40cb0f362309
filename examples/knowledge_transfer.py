"""The product's core promise: a transform tuned against a reference einsum
replays onto a *differently-named* user computation (reference:
doc/compiler_writer_tutorial.rst + test_loopy_utils.py:145-173)."""
import jax.numpy as jnp
import numpy as np

import feinsum_tpu as f
from feinsum_tpu.matching import get_a_matched_einsum, match_fn_to_einsum

# the archived reference einsum (canonical names irrelevant)
ref = f.einsum("xre,rij,ej->xei",
               f.array("Jac", (3, 3, "E"), "float32"),
               f.array("Dmat", (3, 35, 35), "float32"),
               f.array("dofs", ("E", 35), "float32"))


# the user's computation, as they wrote it
def user_gradient(geo_jac, diff_mat, u_dofs):
    return jnp.einsum("spn,pdq,nq->snd", geo_jac, diff_mat, u_dofs)


example = [jnp.ones((3, 3, 10_000), jnp.float32),
           jnp.ones((3, 35, 35), jnp.float32),
           jnp.ones((10_000, 35), jnp.float32)]

matched, name_map = get_a_matched_einsum(user_gradient, example)
print("matched:", matched.get_subscripts())
print("isomorphic to ref:",
      f.canonicalize_einsum(matched) == f.canonicalize_einsum(ref))
print("name map ref->user:", match_fn_to_einsum(user_gradient, example, ref))

# apply the best-known schedule for this einsum class to the user's program
program = f.generate_program_with_opt_einsum_schedule(matched).with_descriptor(
    backend="pallas", block_long=4096)
fn = f.build_executable(program, long_dim_length=10_000)
out = fn({"geo_jac": example[0], "diff_mat": example[1],
          "u_dofs": example[2]})
print("output:", out[0].shape, np.asarray(out[0]).mean())
