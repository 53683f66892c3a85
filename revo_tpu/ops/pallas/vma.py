"""shard_map varying-axes (vma) plumbing for pallas_call out_shapes.

JAX >= 0.9's jax.shard_map checks that every op inside a sharded region
propagates the set of mesh axes its value varies over ("vma").  A
pallas_call's outputs get their vma from the ShapeDtypeStruct passed as
out_shape, which defaults to frozenset() — so a kernel running on per-device
shards fails check_vma unless the out_shape carries the union of the
operands' varying axes.  out_struct() builds that struct.
"""

import jax


def out_struct(shape, dtype, *operands):
    """jax.ShapeDtypeStruct for a pallas_call out_shape whose varying-axes
    set (vma) is the union of the operands' — required by jax.shard_map's
    check_vma when a kernel runs inside a sharded region (JAX >= 0.9).

    Falls back to a plain struct when vma metadata is unavailable (older
    JAX, concrete arrays outside any shard_map).
    """
    vma = frozenset()
    for op in operands:
        try:
            vma = vma | jax.typeof(op).vma
        except Exception:
            pass
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:
        return jax.ShapeDtypeStruct(shape, dtype)
