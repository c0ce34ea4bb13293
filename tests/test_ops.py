"""Numerics parity of the conv/norm/loss primitives against torch (CPU).

These tests define the torch reference computations inline with functional
torch ops — they validate arithmetic, not reference code."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mra_gan_tpu.ops import (  # noqa: E402
    conv3d,
    conv_transpose3d,
    cor_coe_loss,
    gan_loss,
    instance_norm,
    l1_loss,
    replication_pad3d,
)

RTOL, ATOL = 2e-5, 2e-5


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


def _to_ncdhw(x):
    return torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))


def _from_t(t):
    return np.transpose(t.numpy(), (0, 2, 3, 4, 1))


@pytest.mark.parametrize("k,s,p", [(3, 1, 1), (3, 2, 1), (4, 2, 1), (7, 1, 0), (1, 1, 0)])
def test_conv3d_matches_torch(k, s, p):
    x = _rand(2, 8, 8, 8, 3)
    w = _rand(k, k, k, 3, 5)
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), stride=s, padding=p))
    wt = torch.tensor(np.transpose(w, (4, 3, 0, 1, 2)))  # OIDHW
    want = _from_t(F.conv3d(_to_ncdhw(x), wt, stride=s, padding=p))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0), (2, 2, 0, 0)])
def test_conv_transpose3d_matches_torch(k, s, p, op):
    x = _rand(2, 5, 5, 5, 3)
    w = _rand(k, k, k, 3, 4)
    got = np.asarray(conv_transpose3d(jnp.asarray(x), jnp.asarray(w),
                                      stride=s, padding=p, output_padding=op))
    wt = torch.tensor(np.transpose(w, (3, 4, 0, 1, 2)))  # (in,out,k,k,k)
    want = _from_t(F.conv_transpose3d(_to_ncdhw(x), wt, stride=s, padding=p,
                                      output_padding=op))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("s", [(2, 2, 2), (2, 2, 1), (3, 1, 2)])
def test_conv_transpose3d_blocked_matches_torch(s):
    """kernel==stride, p=0 transposed conv (MONAI DynUNet's upsampler, incl.
    mixed per-axis strides) via the blocked 1^3-conv+interleave form."""
    from mra_gan_tpu.ops.subpixel import conv_transpose3d_blocked

    x = _rand(2, 4, 3, 5, 6)
    w = _rand(*s, 6, 7)
    got = np.asarray(conv_transpose3d_blocked(jnp.asarray(x), jnp.asarray(w)))
    wt = torch.tensor(np.transpose(w, (3, 4, 0, 1, 2)))  # (in,out,kd,kh,kw)
    want = _from_t(F.conv_transpose3d(_to_ncdhw(x), wt, stride=s, padding=0))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_replication_pad_matches_torch():
    x = _rand(1, 4, 5, 6, 2)
    got = np.asarray(replication_pad3d(jnp.asarray(x), 3))
    want = _from_t(F.pad(_to_ncdhw(x), (3,) * 6, mode="replicate"))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_instance_norm_matches_torch():
    x = _rand(2, 6, 6, 6, 4)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = _from_t(F.instance_norm(_to_ncdhw(x), eps=1e-5))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gan_loss_lsgan():
    pred = _rand(2, 3, 3, 3, 1)
    got_real = float(gan_loss(jnp.asarray(pred), True, "lsgan"))
    got_fake = float(gan_loss(jnp.asarray(pred), False, "lsgan"))
    t = torch.tensor(pred)
    np.testing.assert_allclose(got_real, float(F.mse_loss(t, torch.ones_like(t))), rtol=1e-5)
    np.testing.assert_allclose(got_fake, float(F.mse_loss(t, torch.zeros_like(t))), rtol=1e-5)


def test_gan_loss_vanilla():
    prob = 1.0 / (1.0 + np.exp(-_rand(2, 3, 3, 3, 1)))
    got = float(gan_loss(jnp.asarray(prob), True, "vanilla"))
    t = torch.tensor(prob)
    want = float(F.binary_cross_entropy(t, torch.ones_like(t)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_l1_and_cor_coe():
    a, b = _rand(2, 4, 4, 4, 1), _rand(2, 4, 4, 4, 2)[..., :1]
    np.testing.assert_allclose(
        float(l1_loss(jnp.asarray(a), jnp.asarray(b))),
        float(F.l1_loss(torch.tensor(a), torch.tensor(b))), rtol=1e-5)
    ta, tb = torch.tensor(a), torch.tensor(b)
    xv = ta - ta.mean()
    yv = tb - tb.mean()
    r = (xv * yv).sum() / (xv.pow(2).sum().sqrt() * yv.pow(2).sum().sqrt())
    want = float(1 - r ** 2)
    np.testing.assert_allclose(float(cor_coe_loss(jnp.asarray(a), jnp.asarray(b))),
                               want, rtol=1e-4, atol=1e-5)


def test_gan_loss_vanilla_saturated_sigmoid_finite():
    """A sigmoid D saturated to exactly 0.0/1.0 (f32 sigmoid saturates for
    |logit| >~ 17, routine for an untrained unnormalized final conv) must
    yield finite BCE both ways — the two-term form produced 0 * -inf = NaN
    and took the DEFAULT CLI mode (vanilla, --no_lsgan store_false) to NaN
    GAN losses on the first step."""
    from mra_gan_tpu.ops import gan_loss

    for p in (0.0, 1.0, 1e-30, 1.0 - 1e-30):
        pred = jnp.full((2, 3, 3, 3, 1), p, jnp.float32)
        for target in (True, False):
            v = float(gan_loss(pred, target, "vanilla"))
            assert np.isfinite(v), (p, target, v)
    # interior values unchanged vs the textbook BCE
    pred = jnp.asarray([[0.3, 0.9]], jnp.float32)
    want_true = float(np.mean(-np.log([0.3, 0.9])))
    want_false = float(np.mean(-np.log1p([-0.3, -0.9])))
    np.testing.assert_allclose(float(gan_loss(pred, True, "vanilla")), want_true, rtol=1e-6)
    np.testing.assert_allclose(float(gan_loss(pred, False, "vanilla")), want_false, rtol=1e-6)
