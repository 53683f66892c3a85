"""Property tests for revo_tpu.lie, mirroring the Sophus Lie-group test
harness design (reference: thirdparty/Sophus/test/core/tests.hpp:40-417,
instantiated with curated tangent vectors in test/core/test_se3.cpp:19-41)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revo_tpu import lie

# Curated tangent vectors in the spirit of test_se3.cpp:19-41: identity,
# small, generic, and near-pi rotations.
SE3_TANGENTS = np.array(
    [
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [1e-9, 2e-9, -1e-9, 1e-10, -1e-10, 2e-10],
        [0.1, -0.2, 0.3, 0.01, 0.02, -0.03],
        [1.0, 2.0, -1.0, 0.5, -0.7, 0.1],
        [-0.2, 0.1, 4.0, 0.0, 0.0, 3.1],  # near-pi about z
        [0.3, 0.5, 0.1, 3.14159, 0.0, 0.0],  # ~pi about x
        [0.0, 0.0, 0.5, 2.0, 1.0, -1.5],
    ],
    dtype=np.float32,
)


def _random_tangents(n=64, seed=0):
    rng = np.random.default_rng(seed)
    xi = rng.normal(size=(n, 6)).astype(np.float32)
    xi[:, 3:] *= 0.9  # keep |omega| < pi
    return xi


ALL_TANGENTS = np.concatenate([SE3_TANGENTS, _random_tangents()])


class TestSO3:
    def test_exp_is_rotation(self):
        R = lie.exp_so3(jnp.asarray(ALL_TANGENTS[:, 3:]))
        RtR = np.einsum("nij,nkj->nik", np.asarray(R), np.asarray(R))
        np.testing.assert_allclose(
            RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5
        )
        det = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(det, 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        """tests.hpp expLogTest."""
        omega = jnp.asarray(ALL_TANGENTS[:, 3:])
        R = lie.exp_so3(omega)
        omega2 = lie.log_so3(R)
        R2 = lie.exp_so3(omega2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis = axis / np.linalg.norm(axis)
        for theta in [np.pi - 1e-4, np.pi - 1e-6]:
            omega = (theta * axis).astype(np.float32)
            R = lie.exp_so3(jnp.asarray(omega))
            back = np.asarray(lie.log_so3(R))
            R2 = np.asarray(lie.exp_so3(jnp.asarray(back)))
            np.testing.assert_allclose(np.asarray(R), R2, atol=2e-3)

    def test_hat_vee(self):
        """tests.hpp veeHatTest."""
        omega = jnp.asarray(ALL_TANGENTS[:, 3:])
        np.testing.assert_allclose(
            np.asarray(lie.vee_so3(lie.hat_so3(omega))), np.asarray(omega),
            atol=1e-7,
        )

    def test_hat_action(self):
        """hat(w) @ v == cross(w, v)."""
        rng = np.random.default_rng(1)
        w = rng.normal(size=(10, 3)).astype(np.float32)
        v = rng.normal(size=(10, 3)).astype(np.float32)
        got = np.einsum("nij,nj->ni", np.asarray(lie.hat_so3(jnp.asarray(w))), v)
        np.testing.assert_allclose(got, np.cross(w, v), atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(ALL_TANGENTS)
        R, t = lie.exp_se3(xi)
        xi2 = lie.log_se3(R, t)
        R2, t2 = lie.exp_se3(xi2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)

    def test_group_action(self):
        """tests.hpp groupActionTest: T(p) == matrix @ p."""
        xi = jnp.asarray(SE3_TANGENTS)
        R, t = lie.exp_se3(xi)
        pts = jnp.asarray(
            np.random.default_rng(2).normal(size=(7, 5, 3)).astype(np.float32)
        )
        got = lie.transform_points(R, t, pts)
        T = np.asarray(lie.matrix_from_rt(R, t))
        ph = np.concatenate(
            [np.asarray(pts), np.ones((7, 5, 1), np.float32)], axis=-1
        )
        want = np.einsum("nij,npj->npi", T, ph)[..., :3]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_compose_inverse(self):
        xi = jnp.asarray(SE3_TANGENTS)
        R, t = lie.exp_se3(xi)
        Ri, ti = lie.inverse(R, t)
        Re, te = lie.compose(R, t, Ri, ti)
        np.testing.assert_allclose(
            np.asarray(Re), np.broadcast_to(np.eye(3), Re.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-5)

    def test_adjoint(self):
        """tests.hpp adjointTest: exp(Ad_T xi) == T exp(xi) T^-1."""
        xi_T = jnp.asarray(SE3_TANGENTS[3])
        RT, tT = lie.exp_se3(xi_T)
        Ad = lie.adjoint_se3(RT, tT)
        for xi_np in _random_tangents(8, seed=3) * 0.1:
            xi = jnp.asarray(xi_np)
            lhsR, lhst = lie.exp_se3(Ad @ xi)
            Rx, tx = lie.exp_se3(xi)
            Ri, ti = lie.inverse(RT, tT)
            m1R, m1t = lie.compose(RT, tT, Rx, tx)
            rhsR, rhst = lie.compose(m1R, m1t, Ri, ti)
            np.testing.assert_allclose(
                np.asarray(lhsR), np.asarray(rhsR), atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(lhst), np.asarray(rhst), atol=1e-4
            )

    def test_matrix_roundtrip(self):
        xi = jnp.asarray(SE3_TANGENTS)
        R, t = lie.exp_se3(xi)
        T = lie.matrix_from_rt(R, t)
        R2, t2 = lie.rt_from_matrix(T)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2))
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2))
        assert np.allclose(np.asarray(T)[:, 3], [0, 0, 0, 1])

    def test_jit_vmap(self):
        """All ops must be jittable and vmappable (TPU-first requirement)."""
        xi = jnp.asarray(ALL_TANGENTS)
        f = jax.jit(jax.vmap(lambda x: lie.log_se3(*lie.exp_se3(x))))
        out = f(xi)
        assert out.shape == xi.shape
        assert np.isfinite(np.asarray(out)).all()


class TestQuaternion:
    def test_matrix_quaternion_roundtrip(self):
        omega = jnp.asarray(ALL_TANGENTS[:, 3:])
        R = lie.exp_so3(omega)
        q = lie.quaternion_from_matrix(R)
        R2 = lie.matrix_from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_unit_norm(self):
        R = lie.exp_so3(jnp.asarray(ALL_TANGENTS[:, 3:]))
        q = np.asarray(lie.quaternion_from_matrix(R))
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)

    def test_against_scipy_convention(self):
        """x,y,z,w ordering matches the TUM pose-file convention."""
        # 90 degrees about z: q = (0, 0, sin45, cos45)
        R = lie.exp_so3(jnp.asarray([0.0, 0.0, np.pi / 2], dtype=jnp.float32))
        q = np.asarray(lie.quaternion_from_matrix(R))
        np.testing.assert_allclose(
            q, [0.0, 0.0, np.sqrt(0.5), np.sqrt(0.5)], atol=1e-6
        )
