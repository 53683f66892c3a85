"""Worker process for the multi-host bootstrap test (test_distributed.py).

Each worker contributes 2 virtual CPU devices to a 2-process jax.distributed
runtime (the standard way to drive pod code without a pod, SURVEY.md §4(d)),
then participates in a cross-process psum whose expected value is checked on
every process.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", "")
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from revo_tpu.parallel.mesh import maybe_distributed_init, make_mesh


def main() -> None:
    ok = maybe_distributed_init()  # env-driven: JAX_COORDINATOR_ADDRESS etc.
    assert ok, "maybe_distributed_init did not engage"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    # 2 of the 4 global devices are addressable by this process.
    assert len(jax.local_devices()) == 2

    mesh = make_mesh(("pair",))
    sh = NamedSharding(mesh, P("pair"))
    data = np.arange(8, dtype=np.float32)  # globally 8 rows, 2 per device
    x = jax.make_array_from_callback((8,), sh, lambda idx: data[idx])

    @jax.jit
    def total(x):
        return jax.shard_map(
            lambda v: jax.lax.psum(v.sum(), "pair"),
            mesh=mesh,
            in_specs=P("pair"),
            out_specs=P(),
        )(x)

    tot = total(x)
    # Fully-replicated output: every process can read the scalar.
    got = float(np.asarray(tot))
    assert got == float(data.sum()), (got, data.sum())

    # A second collective through the same runtime: weighted block psum in
    # the windowed-BA pattern (per-device (6,6) contributions -> reduced).
    blocks = jax.make_array_from_callback(
        (8, 6),
        sh,
        lambda idx: np.tile(np.arange(6, dtype=np.float32), (8, 1))[idx],
    )

    @jax.jit
    def reduce_blocks(b):
        return jax.shard_map(
            lambda v: jax.lax.psum(v.sum(axis=0), "pair"),
            mesh=mesh,
            in_specs=P("pair"),
            out_specs=P(),
        )(b)

    rb = np.asarray(reduce_blocks(blocks))
    np.testing.assert_allclose(rb, 8.0 * np.arange(6, dtype=np.float32))

    print(f"DISTOK {jax.process_index()} {got}", flush=True)


if __name__ == "__main__":
    main()
