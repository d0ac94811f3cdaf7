"""Parallel scaling paths: GOP-parallel encode + parcat stitch (DCN axis),
mesh sharding + halo exchange (ICI axis, virtual CPU mesh)."""

import os

import numpy as np
import pytest

from vtm_tpu.common.types import ChromaFormat
from vtm_tpu.decoder.declib import Decoder
from vtm_tpu.utils.yuv_io import YuvFormat, read_yuv

TD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata")


def test_gop_parallel_encode_bit_exact():
    """Parallel segment encode + parcat == sequential segment encode."""
    from vtm_tpu.apps.parcat import parcat
    from vtm_tpu.parallel.gop import encode_parallel

    fmt = YuvFormat(64, 64, ChromaFormat.YUV420, 8)
    frames = read_yuv(f"{TD}/tiny64_64x64_420_8.yuv", fmt, 4)
    cfgk = dict(width=64, height=64, qp=32, max_mtt_depth_intra=0)
    bits_par = encode_parallel(frames, cfgk, mode="ldp", segment_len=2,
                               workers=2)
    bits_seq = encode_parallel(frames, cfgk, mode="ldp", segment_len=2,
                               workers=1)
    assert bits_par == bits_seq  # deterministic across process boundaries
    dec = Decoder()
    pics = dec.decode_stream(bits_par)
    assert sorted(p.poc for p in pics) == [0, 1, 2, 3]
    assert all(hr.ok for hr in dec.hash_results)


def test_halo_exchange_cpu_mesh():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices (conftest sets 8)")
    import jax.numpy as jnp
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vtm_tpu.parallel.mesh import codec_mesh, halo_exchange

    mesh = codec_mesh(4, gop=1)
    rows_per, w, halo = 8, 16, 2
    x = np.arange(4 * rows_per * w, dtype=np.int32).reshape(4 * rows_per, w)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("tile", None)))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("tile", None),
             out_specs=P("tile", None))
    def with_halos(t):
        h = halo_exchange(t, halo, "tile")
        # keep shape: return the center (identity) — halos checked via sums
        return h[halo:-halo]

    out = np.asarray(with_halos(xs))
    assert np.array_equal(out, x)

    # verify actual halo content on one shard via a reduction
    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("tile", None), out_specs=P("tile"))
    def halo_sums(t):
        h = halo_exchange(t, halo, "tile")
        return jnp.sum(h[:halo], axis=(0, 1))[None]  # top halo sum per shard

    sums = np.asarray(halo_sums(xs))
    for shard in range(4):
        prev = (shard - 1) % 4
        expect = x[prev * rows_per : (prev + 1) * rows_per][-halo:].sum()
        assert sums[shard] == expect


def test_sharded_recon_step_cpu_mesh():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    from vtm_tpu.parallel.mesh import codec_mesh, sharded_recon_step

    mesh = codec_mesh(4, gop=2)
    rng = np.random.default_rng(0)
    coeff = rng.integers(-256, 256, size=(2, 2, 16, 16)).astype(np.int32)
    pred = rng.integers(0, 255, size=(2, 2, 16, 16)).astype(np.int32)
    orig = rng.integers(0, 255, size=(2, 2, 16, 16)).astype(np.int32)
    recon, sse = sharded_recon_step(mesh, coeff, pred, orig)
    assert recon.shape == coeff.shape
    assert float(sse[0]) >= 0
