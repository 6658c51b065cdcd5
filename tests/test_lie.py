import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tracking_sdf_tpu.core import lie
import ref_numpy


@pytest.mark.parametrize("seed", range(5))
def test_se3_exp_matches_reference(seed):
    rng = np.random.default_rng(seed)
    xi = rng.normal(size=6) * (2.0 if seed % 2 else 0.05)
    R_ref, t_ref = ref_numpy.direct_exponential_map(xi, 1.0)
    pose = lie.se3_exp(jnp.asarray(xi, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(pose.R), R_ref, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pose.t), t_ref, atol=2e-6)


def test_se3_exp_small_angle():
    # near-zero twists: the branchless guards must not produce NaN
    for scale in [0.0, 1e-10, 1e-6, 1e-4]:
        xi = jnp.asarray([1.0, -2.0, 0.5, 1.0, -1.0, 0.3], dtype=jnp.float32) * scale
        pose = lie.se3_exp(xi)
        assert np.all(np.isfinite(np.asarray(pose.R)))
        assert np.all(np.isfinite(np.asarray(pose.t)))
        R_ref, t_ref = ref_numpy.direct_exponential_map(np.asarray(xi, np.float64))
        np.testing.assert_allclose(np.asarray(pose.R), R_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pose.t), t_ref, atol=1e-6)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        xi = rng.normal(size=6).astype(np.float32) * 0.7
        pose = lie.se3_exp(jnp.asarray(xi))
        xi_back = lie.se3_log(pose)
        np.testing.assert_allclose(np.asarray(xi_back), xi, atol=1e-4)


def test_exp_is_differentiable():
    def loss(xi):
        p = lie.se3_exp(xi)
        return jnp.sum(p.R ** 2) + jnp.sum(p.t ** 2)

    g = jax.grad(loss)(jnp.zeros(6, dtype=jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_pose_compose_inverse():
    rng = np.random.default_rng(3)
    a = lie.se3_exp(jnp.asarray(rng.normal(size=6), dtype=jnp.float32))
    b = lie.se3_exp(jnp.asarray(rng.normal(size=6), dtype=jnp.float32))
    ab = lie.pose_compose(a, b)
    x = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(lie.pose_apply(ab, x)),
        np.asarray(lie.pose_apply(a, lie.pose_apply(b, x))),
        atol=1e-5,
    )
    ident = lie.pose_compose(a, lie.pose_inverse(a))
    np.testing.assert_allclose(np.asarray(ident.R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ident.t), np.zeros(3), atol=1e-6)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        w = rng.normal(size=3) * 2.0
        R = lie.so3_exp(jnp.asarray(w, dtype=jnp.float32))
        q = lie.quaternion_from_matrix(R)
        R2 = lie.matrix_from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
