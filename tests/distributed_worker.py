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

    # --- Full VO step across the multi-controller runtime (VERDICT r2
    # item 5): 4 sequences sharded 1-per-device over the 2-process mesh,
    # the complete device-resident scan twin (build + track + promotion +
    # reloc branches) under shard_map, pose-parity-checked against the
    # single-process vo_scan on every locally addressable sequence. ---
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_solver import small_cfg

    from revo_tpu.io.synthetic import SyntheticScene, render_sequence
    from revo_tpu.parallel.batch import vo_scan, vo_scan_batched

    cfg = small_cfg()
    B, N = 4, 5
    scene = SyntheticScene()
    seqs = []
    for seed in range(B):  # deterministic: identical on both processes
        frames = list(render_sequence(scene, cfg.camera, N, seed=seed))
        seqs.append(
            (
                np.stack([f[0] for f in frames]).astype(np.float32),
                np.stack([f[1] for f in frames]).astype(np.float32),
            )
        )
    g_all = np.stack([s[0] for s in seqs])  # (B, N, H, W)
    d_all = np.stack([s[1] for s in seqs])
    sh_seq = NamedSharding(mesh, P("pair"))
    g_sharded = jax.make_array_from_callback(
        g_all.shape, sh_seq, lambda idx: g_all[idx]
    )
    d_sharded = jax.make_array_from_callback(
        d_all.shape, sh_seq, lambda idx: d_all[idx]
    )
    poses_sharded = vo_scan_batched(
        g_sharded, d_sharded, cfg, mesh=mesh, axis="pair"
    )
    # Each process checks the sequences whose shards it owns against a
    # plain single-process vo_scan of the same sequence.
    checked = 0
    for shard in poses_sharded.addressable_shards:
        b0 = shard.index[0].start or 0
        local = np.asarray(shard.data)  # (n_local, N, 4, 4)
        for i in range(local.shape[0]):
            b = b0 + i
            ref, _, _ = vo_scan(
                jnp.asarray(g_all[b]), jnp.asarray(d_all[b]), cfg
            )
            np.testing.assert_allclose(
                local[i], np.asarray(ref), atol=1e-5,
                err_msg=f"sharded vs single-process pose mismatch, seq {b}",
            )
            checked += 1
    assert checked >= 2, f"process checked only {checked} sequences"

    print(f"DISTOK {jax.process_index()} {got}", flush=True)


if __name__ == "__main__":
    main()
