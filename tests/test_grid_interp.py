import numpy as np
import jax
import jax.numpy as jnp

from tracking_sdf_tpu.config import GridParams
from tracking_sdf_tpu.grid import (
    empty_grid,
    world_to_voxel,
    voxel_to_world,
    shepard_l1,
    trilinear,
    trilinear_with_grad,
)
import ref_numpy

PARAMS = GridParams(m=16, width=2.0, height=3.0, depth=1.5,
                    origin=(-1.0, -1.5, -0.75), delta=0.1, epsilon=0.01)


def _ref_grid():
    return ref_numpy.RefGrid(PARAMS.m, PARAMS.width, PARAMS.height, PARAMS.depth,
                             PARAMS.origin, PARAMS.delta, PARAMS.epsilon)


def test_world_voxel_roundtrip_matches_reference():
    g = _ref_grid()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, size=(50, 3))
    ours = np.asarray(world_to_voxel(PARAMS, jnp.asarray(pts, dtype=jnp.float32)))
    for p, o in zip(pts, ours):
        np.testing.assert_allclose(o, g.world_to_voxel(p), atol=1e-5)

    ijk = rng.integers(0, PARAMS.m, size=(50, 3))
    ours = np.asarray(voxel_to_world(PARAMS, jnp.asarray(ijk, dtype=jnp.float32)))
    for v, o in zip(ijk, ours):
        np.testing.assert_allclose(o, g.voxel_center(v), atol=1e-5)


def test_voxel_center_lands_on_integer_coords():
    ijk = jnp.asarray([[3.0, 7.0, 11.0]])
    world = voxel_to_world(PARAMS, ijk)
    back = world_to_voxel(PARAMS, world)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ijk), atol=1e-5)


def test_shepard_matches_reference_oracle():
    rng = np.random.default_rng(1)
    m = PARAMS.m
    D = rng.normal(size=(m, m, m)).astype(np.float32)
    W = (rng.uniform(size=(m, m, m)) > 0.3).astype(np.float32)  # 30% unobserved

    queries = np.concatenate(
        [
            rng.uniform(-1.0, m, size=(300, 3)),  # incl. out-of-range & negative
            rng.integers(0, m, size=(50, 3)).astype(np.float64),  # exact hits
            rng.integers(0, m, size=(50, 3)) + np.array([1e-7, 0.0, 0.0]),
        ]
    )
    vals, valids = jax.jit(shepard_l1)(
        jnp.asarray(D), jnp.asarray(W), jnp.asarray(queries, dtype=jnp.float32)
    )
    vals, valids = np.asarray(vals), np.asarray(valids)
    for q, v, ok in zip(queries, vals, valids):
        v_ref, ok_ref = ref_numpy.interpolate_distance(D, W, q)
        assert bool(ok) == bool(ok_ref), q
        if ok_ref:
            np.testing.assert_allclose(v, v_ref, rtol=1e-4, atol=1e-5)


def test_shepard_color_matches_reference_oracle():
    """shepard_color vs a direct port of SDF::interpolate_color
    (sdf.cpp:164-217). Our unit-scale colors equal the reference's
    0..255-scale divided by 255 exactly."""
    rng = np.random.default_rng(3)
    m = 8
    R255 = rng.uniform(0, 255, (m, m, m)).astype(np.float32)
    G255 = rng.uniform(0, 255, (m, m, m)).astype(np.float32)
    B255 = rng.uniform(0, 255, (m, m, m)).astype(np.float32)
    Wc = (rng.random((m, m, m)) > 0.35).astype(np.float32)

    coords = np.concatenate([
        rng.uniform(-0.8, m - 0.2, (60, 3)),
        np.floor(rng.uniform(0, m - 1, (20, 3))),  # exact-hit path
    ]).astype(np.float32)

    from tracking_sdf_tpu.grid.interp import shepard_color

    rgb, valid = shepard_color(
        jnp.asarray(R255 / 255.0), jnp.asarray(G255 / 255.0),
        jnp.asarray(B255 / 255.0), jnp.asarray(Wc), jnp.asarray(coords),
    )
    rgb = np.asarray(rgb)
    valid = np.asarray(valid)
    for n, c in enumerate(coords):
        (r_ref, g_ref, b_ref), ok_ref = ref_numpy.interpolate_color(
            R255, G255, B255, Wc, c
        )
        assert bool(valid[n]) == ok_ref, c
        if ok_ref:
            np.testing.assert_allclose(rgb[n], [r_ref, g_ref, b_ref],
                                       atol=1e-5, err_msg=str(c))


def test_trilinear_exact_on_linear_field():
    # a trilinear interpolant reproduces any linear function exactly
    m = 8
    i, j, k = np.meshgrid(np.arange(m), np.arange(m), np.arange(m), indexing="ij")
    D = (2.0 * i - 3.0 * j + 0.5 * k + 1.0).astype(np.float32)
    W = np.ones((m, m, m), np.float32)
    rng = np.random.default_rng(2)
    q = rng.uniform(0, m - 1.001, size=(100, 3)).astype(np.float32)
    vals, grads, valid = trilinear_with_grad(jnp.asarray(D), jnp.asarray(W), jnp.asarray(q))
    expected = 2.0 * q[:, 0] - 3.0 * q[:, 1] + 0.5 * q[:, 2] + 1.0
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(vals), expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads), np.tile([2.0, -3.0, 0.5], (100, 1)), rtol=1e-4, atol=1e-4
    )


def test_trilinear_grad_matches_autodiff():
    rng = np.random.default_rng(3)
    m = 8
    D = rng.normal(size=(m, m, m)).astype(np.float32)
    W = (rng.uniform(size=(m, m, m)) > 0.2).astype(np.float32)
    q = rng.uniform(0.2, m - 1.2, size=(50, 3)).astype(np.float32)

    def val(qi):
        v, _ = trilinear(jnp.asarray(D), jnp.asarray(W), qi)
        return v

    auto = jax.vmap(jax.grad(val))(jnp.asarray(q))
    _, manual, valid = trilinear_with_grad(jnp.asarray(D), jnp.asarray(W), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(manual), np.asarray(auto), rtol=1e-3, atol=1e-4)


def test_trilinear_invalid_when_all_corners_unobserved():
    m = 8
    D = jnp.ones((m, m, m), dtype=jnp.float32)
    W = jnp.zeros((m, m, m), dtype=jnp.float32)
    v, valid = trilinear(D, W, jnp.asarray([[3.5, 3.5, 3.5]]))
    assert not bool(valid[0])
    v, valid = shepard_l1(D, W, jnp.asarray([[3.5, 3.5, 3.5]]))
    assert not bool(valid[0])


def test_empty_grid_init_matches_reference():
    g = empty_grid(PARAMS)
    assert float(g.D[0, 0, 0]) == PARAMS.width + PARAMS.height + PARAMS.depth
    assert float(g.W.sum()) == 0.0
    np.testing.assert_allclose(np.asarray(g.R), 0.4)


def test_brick_masked_view_matches_flat_dm():
    """trilinear_with_grad_nan against a BrickMaskedView must be bit-equal
    to the flat masked_view path for all queries, including cell edges,
    grid borders, and out-of-bounds lanes."""
    from tracking_sdf_tpu.fusion.brickmajor import (
        brick_grid_from_dense, brick_masked_view)
    from tracking_sdf_tpu.grid.grid import TSDFGrid
    from tracking_sdf_tpu.grid.interp import masked_view, trilinear_with_grad_nan

    rng = np.random.default_rng(11)
    m = 32
    params = GridParams(m=m, width=2.0, height=2.0, depth=2.0,
                        origin=(-1.0, -1.0, -1.0))
    D = rng.normal(size=(m, m, m)).astype(np.float32)
    W = (rng.uniform(size=(m, m, m)) > 0.3).astype(np.float32)
    z = np.zeros_like(D)
    grid = TSDFGrid(jnp.asarray(D), jnp.asarray(W), jnp.asarray(z),
                    jnp.asarray(z), jnp.asarray(z), jnp.asarray(z))
    bg = brick_grid_from_dense(grid, (8, 8, 8))
    view = brick_masked_view(bg, params, (8, 8, 8))
    Dm = masked_view(grid.D, grid.W)

    q = np.concatenate([
        rng.uniform(-2.0, m + 1.0, size=(500, 3)),        # incl. OOB
        rng.integers(0, m, size=(100, 3)).astype(float),  # exact corners
        np.stack([np.full(50, 0.25), rng.uniform(0, m - 1, 50),
                  np.full(50, m - 1.25)], axis=-1),        # borders
    ]).astype(np.float32)

    v0, g0, ok0 = trilinear_with_grad_nan(Dm, jnp.asarray(q))
    v1, g1, ok1 = trilinear_with_grad_nan(view, jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=0, atol=0)

    # storage is fat (NB, BV) rows (see _row_w: width-128 storage measured
    # 3x slower end-to-end); the view's width-128 rows are a pure reshape
    # of D in brick order
    assert view.rows.shape == (bg.D.size // 128, 128)
    np.testing.assert_array_equal(
        np.asarray(view.rows).reshape(bg.D.shape), np.asarray(bg.D))
