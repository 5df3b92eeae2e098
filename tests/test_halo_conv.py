"""Halo-exchange W-sharded conv == unsharded conv (exact)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cosmos_predict2_tpu.parallel.halo_conv import conv3d_w_sharded, conv_w_sharded


def _ref_conv3d(x, k, strides, pads):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(x, k, strides, pads, dimension_numbers=dn)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("cp",))


@pytest.mark.chips(8)
@pytest.mark.level(0)
@pytest.mark.parametrize(
    "stride_w,pad_w",
    [(1, (1, 1)), (2, (0, 1))],  # VAE stride-1 SAME and stride-2 downsample
)
def test_conv3d_w_sharded_exact(stride_w, pad_w):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 5, 8, 16, 6))  # W=16 over 4 shards
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 6, 4)) * 0.1
    strides = (1, 1, stride_w)
    pads = ((2, 0), (1, 1), pad_w)  # causal T pad like the VAE
    want = _ref_conv3d(x, k, strides, pads)

    mesh = _mesh(4)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, None, "cp", None)))
        got = jax.jit(lambda a, b: conv3d_w_sharded(a, b, strides, pads))(xs, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_conv2d_w_sharded_exact_and_grad():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 3))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 5)) * 0.1

    def ref(x, k):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

    want = ref(x, k)
    want_gk = jax.grad(lambda k: jnp.sum(ref(x, k) ** 2))(k)

    mesh = _mesh(4)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "cp", None)))
        f = lambda a, b: conv_w_sharded(a, b, stride_w=1, pad_w=(1, 1), other_strides=(1,), other_pads=((1, 1),))  # noqa: E731
        got = jax.jit(f)(xs, k)
        got_gk = jax.jit(jax.grad(lambda b: jnp.sum(f(xs, b) ** 2)))(k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gk), np.asarray(want_gk), atol=3e-4, rtol=1e-4)


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_bad_padding_rejected():
    x = jnp.zeros((1, 4, 4, 8, 2))
    k = jnp.zeros((3, 3, 3, 2, 2))
    mesh = _mesh(4)
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="pad_w"):
            conv3d_w_sharded(x, k, (1, 1, 2), ((1, 1), (1, 1), (1, 1)))
