"""
Multi-chip execution of batched-einsum programs over a ``jax.sharding.Mesh``.

The reference is single-device (SURVEY.md §2.4); this layer is the TPU-native
extension: the parametric element axis is embarrassingly parallel (every
archived einsum's contractions are element-local), so

* :func:`sharded_einsum_executable` shards the long axis across a mesh axis
  with ``shard_map`` — pure data parallelism over ICI, no collectives;
* :func:`reduction_sharded_executable` additionally splits one *contracted*
  axis across a second mesh axis and ``psum``s partial results — the
  tensor-parallel pattern, used when a single chip's HBM bandwidth is the
  bottleneck and operands are sharded at rest.

Each shard runs the same fused Pallas/XLA kernel built by
``build_executable``; XLA inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..codegen.program import (
    EinsumProgram,
    build_executable,
    get_index_lengths,
)
from ..einsum import SizeParam


def _long_axis(program: EinsumProgram) -> str:
    e = program.einsum
    params = [ix for ix, ln in e.index_to_dim_length.items()
              if isinstance(ln, SizeParam)]
    if program.descriptor.grid_index is not None:
        return program.descriptor.grid_index
    if not params:
        raise ValueError("no parametric axis to shard over")
    out_params = [ix for ix in e.out_idx_set if ix in params]
    return (out_params or params)[0]


def _specs_for(program: EinsumProgram, shard_axis: str, mesh_axis: str,
               extra: Optional[dict] = None):
    """P-specs for inputs (dict) and outputs (tuple) of the executable:
    arrays carrying *shard_axis* are sharded on *mesh_axis* along it; *extra*
    maps an additional index letter to a mesh axis."""
    from jax.sharding import PartitionSpec as P

    e = program.einsum
    extra = extra or {}
    layouts = program.descriptor.arg_layouts_map

    def spec_of(idx_set, name=None):
        if name is not None and name in layouts:
            idx_set = tuple(idx_set[p] for p in layouts[name])
        return P(*[
            mesh_axis if ix == shard_axis else extra.get(ix)
            for ix in idx_set])

    arg_idx = {}
    for row in e.args:
        for arg, idx_set in zip(row, e.in_idx_sets):
            arg_idx[arg.name] = idx_set
    in_specs = {name: spec_of(idx_set, name)
                for name, idx_set in arg_idx.items()}
    out_spec = spec_of(tuple(e.out_idx_set))
    return in_specs, tuple(out_spec for _ in range(e.b))


def sharded_einsum_executable(program: EinsumProgram, mesh, *,
                              mesh_axis: str = "data",
                              long_dim_length: int = 100_000,
                              shard_axis: Optional[str] = None):
    """``fn(arrays_by_name) -> tuple``: the program's long axis sharded over
    ``mesh.shape[mesh_axis]`` devices; each device runs the single-chip fused
    kernel on its slab."""
    import jax
    from jax import shard_map

    shard_axis = shard_axis or _long_axis(program)
    n_shards = mesh.shape[mesh_axis]
    if long_dim_length % n_shards:
        raise ValueError(
            f"long axis ({long_dim_length}) must divide over"
            f" {n_shards} shards")
    lengths = get_index_lengths(program.einsum, long_dim_length)
    local_lengths = dict(lengths)
    local_lengths[shard_axis] = lengths[shard_axis] // n_shards
    local_fn = build_executable(program, index_to_length=local_lengths)

    in_specs, out_specs = _specs_for(program, shard_axis, mesh_axis)

    sharded = shard_map(
        lambda arrs: local_fn(arrs),
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=out_specs,
        check_vma=False)
    return jax.jit(sharded)


def reduction_sharded_executable(program: EinsumProgram, mesh, *,
                                 data_axis: str = "data",
                                 model_axis: str = "model",
                                 reduction_index: Optional[str] = None,
                                 long_dim_length: int = 100_000,
                                 shard_axis: Optional[str] = None):
    """2D-sharded executable: long axis over *data_axis* (pure DP) and one
    contracted index over *model_axis* (TP) with a ``psum`` over partial
    contractions riding ICI."""
    import jax
    from jax import shard_map

    e = program.einsum
    shard_axis = shard_axis or _long_axis(program)
    if reduction_index is None:
        # largest contracted axis
        candidates = [(ix, e.index_to_dim_length[ix])
                      for ix in e.sum_indices
                      if not isinstance(e.index_to_dim_length[ix], SizeParam)]
        if not candidates:
            raise ValueError("no concrete contracted axis to shard")
        reduction_index = max(candidates, key=lambda kv: int(kv[1]))[0]

    n_data = mesh.shape[data_axis]
    n_model = mesh.shape[model_axis]
    lengths = get_index_lengths(e, long_dim_length)
    if lengths[shard_axis] % n_data:
        raise ValueError("long axis must divide over the data mesh axis")
    if lengths[reduction_index] % n_model:
        raise ValueError(
            f"reduction axis {reduction_index} (={lengths[reduction_index]})"
            f" must divide over {n_model} model shards")
    local_lengths = dict(lengths)
    local_lengths[shard_axis] = lengths[shard_axis] // n_data
    local_lengths[reduction_index] = lengths[reduction_index] // n_model
    local_fn = build_executable(program, index_to_length=local_lengths)

    in_specs, out_specs = _specs_for(
        program, shard_axis, data_axis, extra={reduction_index: model_axis})

    def shard_fn(arrs):
        partial = local_fn(arrs)
        return tuple(
            jax.lax.psum(p, axis_name=model_axis) for p in partial)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(in_specs,),
        out_specs=out_specs,
        check_vma=False)
    return jax.jit(sharded)


def make_mesh(shape: dict):
    """Mesh from {'data': n, 'model': m} over the available devices."""
    import jax
    from jax.sharding import Mesh

    names = tuple(shape)
    dims = tuple(shape[n] for n in names)
    n_dev = int(np.prod(dims))
    devices = np.array(jax.devices()[:n_dev]).reshape(dims)
    return Mesh(devices, names)
