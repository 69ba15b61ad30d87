"""Small JAX typing helpers shared across the engine."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def with_vma_of(x, ref):
    """Give a constant-built array ``x`` the varying-axes (vma) type of
    ``ref`` (an array or a pytree of arrays — the vma types of all leaves are
    merged).

    Under ``shard_map(check_vma=True)`` a ``scan``/``while_loop`` carry
    initialized from constants is typed *unvarying* over the mesh axis; when
    the loop body mixes it with shard-varying data the carry output becomes
    varying and tracing fails with a carry-type mismatch. Deriving a zero from
    the varying input and folding it into the init fixes the carry type. XLA
    constant-folds the zero, so this is free at runtime, and outside
    ``shard_map`` it is a no-op.
    """
    z = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(ref):
        z = z + (leaf.reshape(-1)[0] * 0).astype(jnp.float32)
    if x.dtype == jnp.bool_:
        return jnp.logical_xor(x, z != 0)
    return x + z.astype(x.dtype)
