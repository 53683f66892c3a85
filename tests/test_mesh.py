"""Tests for mesh construction helpers."""
import jax
import numpy as np
import pytest

from revo_tpu.parallel.mesh import make_mesh, maybe_distributed_init


class TestMakeMesh:
    def test_single_axis(self):
        mesh = make_mesh(("seq",))
        assert mesh.shape["seq"] == len(jax.devices())

    def test_two_axis_with_infer(self):
        mesh = make_mesh(("seq", "pair"), (-1, 2))
        assert mesh.shape["seq"] * mesh.shape["pair"] == len(jax.devices())
        assert mesh.shape["pair"] == 2

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            make_mesh(("a", "b"), (3, 5))

    def test_multi_axis_requires_sizes(self):
        with pytest.raises(ValueError):
            make_mesh(("a", "b"))


class TestDistributedInit:
    def test_noop_single_host(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert maybe_distributed_init() is False
