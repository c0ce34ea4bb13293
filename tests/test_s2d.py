"""Exactness of the space-to-depth conv reformulation (ops/s2d.py) and its
integration into Conv3D's same_edge_pad dispatch."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mra_gan_tpu.ops.conv import conv3d, replication_pad3d
from mra_gan_tpu.ops.s2d import conv3d_s2d, depth_to_space, space_to_depth


def test_s2d_d2s_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8, 3).astype(np.float32))
    for f in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, f), f)), np.asarray(x))


@pytest.mark.parametrize("k,f,ci,co,sz", [
    (7, 4, 1, 32, 16), (7, 4, 32, 1, 16), (7, 2, 1, 8, 16),
    (3, 4, 2, 5, 8), (5, 2, 3, 4, 8),
])
def test_conv3d_s2d_exact(k, f, ci, co, sz):
    rng = np.random.RandomState(k * 10 + f)
    x = jnp.asarray(rng.randn(1, sz, sz, sz, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, k, ci, co).astype(np.float32) * 0.1)
    ref = conv3d(replication_pad3d(x, (k - 1) // 2), w)
    got = conv3d_s2d(x, w, f=f, pad_mode="edge")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv3d_s2d_grad_matches_direct():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 7, 1, 4).astype(np.float32) * 0.1)

    def loss_direct(w, x):
        return jnp.sum(conv3d(replication_pad3d(x, 3), w) ** 2)

    def loss_s2d(w, x):
        return jnp.sum(conv3d_s2d(x, w, f=4) ** 2)

    gd = jax.grad(loss_direct)(w, x)
    gs = jax.grad(loss_s2d)(w, x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-3, atol=1e-3)


def test_conv3d_module_dispatch():
    from mra_gan_tpu.models.networks import Conv3D, _s2d_factor

    # auto rules: skinny head -> f4, skinny stem -> f2, fat channels -> direct
    assert _s2d_factor((7, 7, 7), 1, 32, 1, (64, 64, 64)) == 4
    assert _s2d_factor((7, 7, 7), 1, 1, 32, (64, 64, 64)) == 2
    assert _s2d_factor((7, 7, 7), 1, 32, 32, (64, 64, 64)) == 0
    assert _s2d_factor((3, 3, 3), 1, 1, 32, (64, 64, 64)) == 0
    assert _s2d_factor((7, 7, 7), 2, 1, 32, (64, 64, 64)) == 0
    # non-divisible spatial falls back
    assert _s2d_factor((7, 7, 7), 1, 1, 32, (63, 64, 64)) == 0

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    mod = Conv3D(8, 7, same_edge_pad=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(params, x)
    k = params["params"]["kernel"]
    b = params["params"]["bias"]
    ref = conv3d(replication_pad3d(x, 3), k) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,p,ci,co,sz", [(4, 1, 1, 32, 16), (3, 1, 2, 8, 12), (2, 0, 1, 4, 8)])
def test_conv3d_s2d_stride2_exact(k, p, ci, co, sz):
    from mra_gan_tpu.ops.s2d import conv3d_s2d_stride2

    rng = np.random.RandomState(k + p)
    x = jnp.asarray(rng.randn(2, sz, sz + 2, sz, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, k, ci, co).astype(np.float32) * 0.1)
    ref = conv3d(x, w, stride=2, padding=p)
    got = conv3d_s2d_stride2(x, w, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv3d_s2d_stride2_grad():
    from mra_gan_tpu.ops.s2d import conv3d_s2d_stride2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 4, 1, 4).astype(np.float32) * 0.1)
    gd = jax.grad(lambda w: jnp.sum(conv3d(x, w, stride=2, padding=1) ** 2))(w)
    gs = jax.grad(lambda w: jnp.sum(conv3d_s2d_stride2(x, w, 1) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# cell-domain ops


def test_edge_pad_cells_matches_true_edge_pad():
    from mra_gan_tpu.ops.s2d import edge_pad_cells, space_to_depth

    rng = np.random.RandomState(3)
    for f, pad_cells, c in [(2, 2, 3), (4, 1, 2)]:
        x = jnp.asarray(rng.randn(2, 8, 8, 8, c).astype(np.float32))
        pad = f * pad_cells
        ref = space_to_depth(
            jnp.pad(x, ((0, 0),) + ((pad, pad),) * 3 + ((0, 0),), mode="edge"), f)
        got = edge_pad_cells(space_to_depth(x, f), f, pad_cells, c)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_edge_pad_cells_forms_and_vjp_agree():
    """edge_pad_cells has a mixed lowering (frame-form forward, concat-form
    adjoint via custom_vjp). Pin: (a) frame forward == concat forward, and
    (b) the custom VJP == autodiff of the plain concat form — i.e. the exact
    adjoint of the (linear) padding map."""
    from mra_gan_tpu.ops.s2d import (_edge_pad_cells_concat,
                                     _edge_pad_cells_frame, edge_pad_cells,
                                     space_to_depth)

    rng = np.random.RandomState(11)
    for f, pad_cells, c in [(2, 2, 3), (4, 1, 2)]:
        x = jnp.asarray(rng.randn(2, 8, 8, 8, c).astype(np.float32))
        xc = space_to_depth(x, f)
        np.testing.assert_array_equal(
            np.asarray(_edge_pad_cells_frame(xc, f, pad_cells, c)),
            np.asarray(_edge_pad_cells_concat(xc, f, pad_cells, c)))
        ct = jnp.asarray(rng.randn(
            *edge_pad_cells(xc, f, pad_cells, c).shape).astype(np.float32))
        g_got = jax.grad(
            lambda z: jnp.sum(edge_pad_cells(z, f, pad_cells, c) * ct))(xc)
        g_ref = jax.grad(
            lambda z: jnp.sum(_edge_pad_cells_concat(z, f, pad_cells, c)
                              * ct))(xc)
        np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_ref))


def test_regroup_cells_exact():
    from mra_gan_tpu.ops.s2d import depth_to_space, regroup_cells, space_to_depth

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 5).astype(np.float32))
    xc2 = space_to_depth(x, 2)
    got = regroup_cells(xc2, 2, 4, 5)
    ref = space_to_depth(x, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(depth_to_space(got, 4)), np.asarray(x))


def test_conv3d_s2d_cells_roundtrip():
    from mra_gan_tpu.ops.conv import replication_pad3d
    from mra_gan_tpu.ops.s2d import conv3d_s2d_cells, depth_to_space, space_to_depth

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 7, 2, 3).astype(np.float32) * 0.1)
    ref = conv3d(replication_pad3d(x, 3), w, 1, 0)
    out_cells = conv3d_s2d_cells(space_to_depth(x, 2), w, f=2, d2s=False)
    got = depth_to_space(out_cells, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv3d_stride2_cells_matches():
    from mra_gan_tpu.ops.s2d import conv3d_stride2_cells, space_to_depth

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.1)
    ref = conv3d(x, w, stride=2, padding=1)
    got = conv3d_stride2_cells(space_to_depth(x, 2), w, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_grouped_instance_norm_matches_true_domain():
    from mra_gan_tpu.ops.norm import instance_norm_act, instance_norm_act_grouped
    from mra_gan_tpu.ops.s2d import depth_to_space, space_to_depth

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 3).astype(np.float32) * 2 + 1)
    ref = instance_norm_act(x, 1e-5, "relu")
    got = depth_to_space(
        instance_norm_act_grouped(space_to_depth(x, 2), 8, 1e-5, "relu"), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
    # gradients agree too (custom VJPs on both sides)
    g_ref = jax.grad(lambda v: jnp.sum(instance_norm_act(v, 1e-5, "relu") ** 2))(x)
    g_cells = jax.grad(lambda v: jnp.sum(
        instance_norm_act_grouped(space_to_depth(v, 2), 8, 1e-5, "relu") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_cells), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_subpixel_cells_out_matches_d2s():
    from mra_gan_tpu.ops.s2d import depth_to_space
    from mra_gan_tpu.ops.subpixel import conv_transpose3d_subpixel

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 4, 4, 4, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 2).astype(np.float32) * 0.1)
    full = conv_transpose3d_subpixel(x, w, 1, 1, d2s=True)
    cells = conv_transpose3d_subpixel(x, w, 1, 1, d2s=False)
    np.testing.assert_array_equal(np.asarray(depth_to_space(cells, 2)),
                                  np.asarray(full))


def test_subpixel_f4_direct_exact():
    """conv_transpose3d_subpixel_f4: true in -> f4 cells in one stride-2
    blocked conv (available via ConvTranspose3D(cells_out=4); not used by
    the default generator — measured slower there, see CLAUDE.md)."""
    from mra_gan_tpu.ops.s2d import space_to_depth
    from mra_gan_tpu.ops.subpixel import (
        conv_transpose3d_subpixel,
        conv_transpose3d_subpixel_f4,
    )

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 8, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 3, 2).astype(np.float32) * 0.1)
    ref = space_to_depth(conv_transpose3d_subpixel(x, w, 1, 1), 4)
    got = conv_transpose3d_subpixel_f4(x, w, 1, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_head_stride2_cells_exact_and_grads():
    """conv3d_head_stride2_cells (the generator-head fast path): forward
    exactness vs conv3d_s2d and gradient parity for both the f4-domain dx
    (k=7) and the autodiff fallback (k in {3,5})."""
    import jax

    from mra_gan_tpu.ops.s2d import (
        conv3d_head_stride2_cells,
        conv3d_s2d,
        space_to_depth,
    )

    rng = np.random.RandomState(10)
    # batch 6 exercises the large-batch native-dx branch (batch > 4)
    for k, ci, co, s, n in [(7, 32, 1, 16, 1), (7, 3, 2, 12, 1),
                            (5, 4, 1, 8, 1), (3, 5, 3, 8, 1), (7, 2, 1, 8, 6)]:
        x = jnp.asarray(rng.randn(n, s, s, s, ci).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, k, ci, co).astype(np.float32) * 0.1)
        f = 4 if s % 4 == 0 else 2
        ref_fn = lambda x, w: conv3d_s2d(x, w, f=f, pad_mode="edge")
        new_fn = lambda x, w: conv3d_head_stride2_cells(space_to_depth(x, 2), w)
        np.testing.assert_allclose(np.asarray(new_fn(x, w)),
                                   np.asarray(ref_fn(x, w)),
                                   rtol=1e-4, atol=1e-5)
        loss_r = lambda x, w: jnp.sum(jnp.sin(ref_fn(x, w)))
        loss_n = lambda x, w: jnp.sum(jnp.sin(new_fn(x, w)))
        gr = jax.grad(loss_r, (0, 1))(x, w)
        gn = jax.grad(loss_n, (0, 1))(x, w)
        for a, b in zip(gr, gn):
            scale = float(jnp.max(jnp.abs(a))) + 1e-6
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale,
                                       rtol=0, atol=2e-4)


def test_batch_gates_key_on_per_device_batch():
    """The batch-gated variants (per-axis s2d/d2s relayout decomposition and
    the head-conv f4-domain dx) must key on the PER-DEVICE batch under
    data-parallel pjit — the trace sees the GLOBAL batch, so the gates
    divide by core.spatial_ctx.dp_batch_divisor. Asserts the traced program
    actually flips with the hint and that both forms agree numerically."""
    from mra_gan_tpu.core.spatial_ctx import dp_batch_sharded
    from mra_gan_tpu.ops.s2d import conv3d_head_stride2_cells

    x8 = jnp.asarray(np.random.RandomState(3)
                     .randn(8, 8, 8, 8, 4).astype(np.float32))
    # NB: fresh lambdas per trace — jax caches traces on function identity,
    # so reusing one object would return the first trace regardless of the
    # hint context.
    for make_op in (lambda: (lambda x: space_to_depth(x, 2)),
                    lambda: (lambda x: depth_to_space(space_to_depth(x, 2), 2))):
        j_global = jax.make_jaxpr(make_op())(x8)
        with dp_batch_sharded(8):
            j_hint = jax.make_jaxpr(make_op())(x8)
        assert str(j_hint) != str(j_global), "gate ignored the DP hint"
        with dp_batch_sharded(8):
            hinted = make_op()(x8)
        np.testing.assert_array_equal(np.asarray(hinted),
                                      np.asarray(make_op()(x8)))

    # head-conv bwd: k=7, even dims, batch 8 -> native dx unhinted,
    # f4-domain dx at per-device batch 1
    w = jnp.asarray(np.random.RandomState(4)
                    .randn(7, 7, 7, 4, 1).astype(np.float32) * 0.1)
    xp = space_to_depth(x8, 2)

    def make_grad():
        loss = lambda x, w: jnp.sum(jnp.sin(conv3d_head_stride2_cells(x, w)))
        return jax.grad(loss, (0, 1))

    j_global = jax.make_jaxpr(make_grad())(xp, w)
    with dp_batch_sharded(8):
        j_hint = jax.make_jaxpr(make_grad())(xp, w)
    assert str(j_hint) != str(j_global), "head-dx gate ignored the DP hint"
    g_ref = make_grad()(xp, w)
    with dp_batch_sharded(8):
        g_hint = make_grad()(xp, w)
    for a, b in zip(g_ref, g_hint):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, rtol=0, atol=2e-4)
