"""Explicit halo exchange over ICI with shard_map + ppermute.

GSPMD (``nellie_tpu.mesh.sharded``) partitions the dense kernels
automatically; this module is the *explicit* SPMD path for stencil
kernels whose halo XLA cannot infer (e.g. a whole fused per-frame
pipeline treated as a black box), mirroring the reference's halo-padded
chunk iteration (``filtering.py:864-908``) as ICI collectives:

  each shard ppermutes its boundary slabs to both Z-neighbours,
  concatenates them as a local halo, applies the kernel, and crops.

Edge shards receive a zero slab (the reference pads volume borders the
same way).  Exact for any kernel whose receptive field <= halo.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7 location
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def halo_exchange_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    volume: jnp.ndarray,
    mesh: Mesh,
    halo: int,
    axis_name: str = "z",
):
    """Apply ``fn`` to a Z-sharded volume with a ``halo``-deep exchange.

    ``fn`` maps an extended local block (halo_lo + local + halo_hi along
    axis 0) to an equally-shaped output; the result is cropped back to
    the local shard.  Boundary behaviour matches zero padding.
    """
    n_shards = mesh.shape[axis_name]
    if volume.shape[0] % n_shards != 0:
        raise ValueError(
            f"Z={volume.shape[0]} must divide evenly over {n_shards} shards")
    local_z = volume.shape[0] // n_shards
    if halo > local_z:
        raise ValueError(f"halo {halo} exceeds local shard depth {local_z}")

    def local_fn(block):
        # block: (local_z, Y, X)
        idx = lax.axis_index(axis_name)
        up = [(i, (i + 1) % n_shards) for i in range(n_shards)]      # send to z+1
        down = [(i, (i - 1) % n_shards) for i in range(n_shards)]    # send to z-1

        # my top slab goes to the neighbour above; I receive the slab below
        lo_slab = lax.ppermute(block[-halo:], axis_name, up)     # from idx-1
        hi_slab = lax.ppermute(block[:halo], axis_name, down)    # from idx+1

        zero = jnp.zeros_like(block[:halo])
        lo_slab = jnp.where(idx == 0, zero, lo_slab)
        hi_slab = jnp.where(idx == n_shards - 1, zero, hi_slab)

        extended = jnp.concatenate([lo_slab, block, hi_slab], axis=0)
        out = fn(extended)
        return out[halo : halo + block.shape[0]]

    sharded = jax.device_put(volume, NamedSharding(mesh, P(axis_name)))
    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=P(axis_name), out_specs=P(axis_name),
    )
    return jax.jit(mapped)(sharded)
