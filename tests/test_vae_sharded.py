"""VAE spatial sharding: GSPMD-partitioned convs on the virtual mesh.

The reference shards the VAE spatially over a rank grid with manual conv
halo exchanges (wan2pt1_2d_plugins.py:139-728). Here the NDHWC convs are
partitioned by XLA GSPMD from sharding constraints — the halo exchange is
inserted by the compiler. This test pins that behavior: spatially-sharded
encode/decode must equal single-device results.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cosmos_predict2_tpu.parallel.mesh import make_mesh
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_spatially_sharded_vae_matches_single_device():
    cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(cfg)
    clip = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 32, 64, 3), minval=-1, maxval=1)
    params = vae.init(jax.random.PRNGKey(1), clip)

    z_ref = vae.apply(params, clip, method=WanVAE.encode)
    px_ref = vae.apply(params, z_ref, method=WanVAE.decode)

    # 2x2 spatial grid over (H, W) using the fsdp x cp mesh axes
    mesh = make_mesh(1, 2, 2, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        # (B, T, H, W, C): H over fsdp, W over cp
        sharded = jax.device_put(clip, NamedSharding(mesh, P(None, None, "fsdp", "cp")))
        z = jax.jit(lambda p, v: vae.apply(p, v, method=WanVAE.encode))(params, sharded)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=2e-4)

        z_sharded = jax.device_put(z_ref, NamedSharding(mesh, P(None, None, "fsdp", "cp")))
        px = jax.jit(lambda p, v: vae.apply(p, v, method=WanVAE.decode))(params, z_sharded)
        np.testing.assert_allclose(np.asarray(px), np.asarray(px_ref), atol=2e-4)


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_spatially_sharded_streaming_vae_matches_single_device():
    """The STREAMING (cache-carrying) encode/decode under a 2D spatial mesh
    == single device: the conv halo exchanges GSPMD inserts must compose
    with the chunked feat-cache programs (donated cache pytrees stay
    sharded chunk-to-chunk)."""
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(cfg)
    clip = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 32, 64, 3), minval=-1, maxval=1)
    params = vae.init(jax.random.PRNGKey(1), clip)

    z_ref = wvs.encode_streaming(cfg, params, clip)
    px_ref = wvs.decode_streaming(cfg, params, z_ref)

    mesh = make_mesh(1, 2, 2, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        sharded = jax.device_put(clip, NamedSharding(mesh, P(None, None, "fsdp", "cp")))
        z = wvs.encode_streaming(cfg, params, sharded)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=2e-4)

        z_sharded = jax.device_put(jnp.asarray(z_ref), NamedSharding(mesh, P(None, None, "fsdp", "cp")))
        px = wvs.decode_streaming(cfg, params, z_sharded)
        np.testing.assert_allclose(np.asarray(px), np.asarray(px_ref), atol=2e-4)


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_sharded_streaming_decode_communication_pattern():
    """The compiled spatially-sharded streaming decode exchanges conv HALOS
    (collective-permute), not whole grids: any all-gather in the program is
    latent-resolution-sized (the global mid-attention), never pixel-scale —
    pins the memory claim behind the GSPMD halo design (reference does the
    same by hand, wan2pt1_2d_plugins.py:139-728)."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(cfg)
    params = vae.init(jax.random.PRNGKey(7), jnp.zeros((1, 5, 32, 64, 3), jnp.float32))
    mesh = make_mesh(1, 2, 2, 1, devices=jax.devices()[:4])
    lat_h, lat_w = 4, 8
    z = jax.random.normal(jax.random.PRNGKey(8), (1, 1, lat_h, lat_w, 16), dtype=jnp.float32)
    with jax.set_mesh(mesh):
        zs = jax.device_put(z, NamedSharding(mesh, P(None, None, "fsdp", "cp")))
        state = wvs.init_decoder_state(cfg, 1, lat_h, lat_w, dtype=cfg.dtype)
        txt = (
            wvs._jitted_chunk("dec", cfg, first=False)
            .lower(params, zs, state.caches)
            .compile()
            .as_text()
        )
    halos = [l for l in txt.splitlines() if "collective-permute(" in l]
    assert len(halos) > 0, "expected GSPMD halo exchanges"
    # decoded pixel chunk is (1, 4, 32, 64, 3) = 24,576 elements; any
    # all-gather must stay well below that (latent-resolution tensors only)
    pixel_elems = 4 * 32 * 64 * 3
    for l in txt.splitlines():
        if "all-gather(" not in l:
            continue
        shapes = re.findall(r"f32\[([\d,]*)\]", l.split("all-gather(")[0])
        for s in shapes:
            elems = 1
            for d in (s.split(",") if s else []):
                elems *= int(d)
            assert elems < pixel_elems // 2, (l[:160], elems)
