"""Pallas implicit-GEMM conv for the video VAE's causal 3x3x3 / 3x3 convs.

XLA's TPU conv emitter reaches only ~26 TF/s / 269 GB/s on the Wan
decoder's NHWC shapes (Cin/Cout in {96,192,384}, H*W up to 704x1280 —
measured in scripts/vae_conv_micro*.py and vae_bench.py; none of the
standard lowering variants beat it, and neither roofline is close). This
kernel expresses the conv as what the MXU actually wants: per (t, row
band) tile, kt*9 accumulated matmuls of a (th*W, Cin) activation slab
against a (Cin, Cout) tap matrix, f32 accumulator, one HBM read of x and
one write of out.

TPU layout rules shape the design (Mosaic requires 8-aligned slices on
the sublane dim):
  * tiles span the FULL width W (sublane dim W is a multiple of 8 for
    every Wan resolution; rows H and frames T are untiled dims where
    arbitrary slicing is legal),
  * the W-halo is handled by padding W to W+8 and doing the dw shift
    with ``pltpu.roll`` (lane-preserving circular shift) followed by an
    offset-0 aligned slice — never an odd-offset slice,
  * the H-halo rides inside the DMA'd band (th+2 rows, H untiled),
  * x stays in HBM (memory_space=ANY) and row bands are fetched with
    explicitly double-buffered async copies so the next band's DMA
    overlaps this band's 27 matmuls.

Contract matches the streaming VAE's `_stream_conv`/`_conv3d` (temporal
taps already concatenated by the cache: T_in = T_out + kt - 1, "valid" in
time, SAME (pad 1) spatially). Reference semantics:
cosmos_predict2/_src/predict2/tokenizers/wan2pt1.py (CausalConv3d).

Measured on the v5e chip at the streaming-decode chunk shapes (bf16):
1.53x XLA at T2 176x320 384ch, 1.47x at 192->384, 1.12x at T4 352x640
192ch, 1.24x at T4 704x1280 96ch. The per-tap/K-folded variants' ceiling
is accumulator / patch-relayout VMEM traffic (~K/6 flop/byte at K=Cin,
~40 TF/s at Cin<=128); see docs/PERF.md VAE section for the history.

Production default (r5): ``conv3d_causal_ring`` — band-major grid with a
(kt+2)-slot per-frame VMEM ring so each input frame-band is DMA'd once
per band instead of kt times. The per-dispatch delta vs per-tap is small
(557 vs 576 ms/steady chunk) but the 3x fewer input DMA transactions
stop competing with the host spool's async D2H pulls, and the overlapped
`out="host"` whole-clip decode drops 20.5 -> 15.2 s (same session; the
r4 overlap fix — producing the transfer buffer in a pallas-free quantize
program — remains in place, wan_vae_streaming._jitted_quant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, b_ref, out_ref, xbuf, sems, *, kt: int, th: int, W: int, n_i: int):
    t = pl.program_id(0)
    i = pl.program_id(1)
    g = t * n_i + i

    def start_fetch(t_, i_, slot):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(t_, kt), pl.ds(i_ * th, th + 2)],
            xbuf.at[slot],
            sems.at[slot],
        ).start()

    @pl.when(g == 0)
    def _():
        start_fetch(t, i, 0)

    # prefetch the next band into the other slot while we compute
    nxt = g + 1
    @pl.when(nxt < pl.num_programs(0) * n_i)
    def _():
        start_fetch(nxt // n_i, nxt % n_i, nxt % 2)

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(t, kt), pl.ds(i * th, th + 2)], xbuf.at[g % 2], sems.at[g % 2]
    ).wait()

    x = xbuf[g % 2]  # (kt, th+2, W+8, Cin)
    cin = x.shape[-1]
    cout = out_ref.shape[-1]
    acc = jnp.zeros((th * W, cout), dtype=jnp.float32)
    for dw in range(3):
        for dt in range(kt):
            for dh in range(3):
                # static slice: aligned shape (W % 8 == 0), small constant
                # offset — Mosaic lowers the sublane offset via vreg shifts
                patch = x[dt, dh : dh + th, dw : dw + W, :].reshape(th * W, cin)
                acc += jnp.dot(patch, w_ref[dt, dh, dw], preferred_element_type=jnp.float32)
    out = acc + b_ref[0].astype(jnp.float32)
    out_ref[...] = out.reshape(1, th, W, cout).astype(out_ref.dtype)


def _pick_th(H: int, W: int, cin: int, cout: int) -> int:
    """Row-band height: divide H, keep VMEM (2 x-slots + acc + out) bounded."""
    best = 1
    for th in (16, 8, 4, 2, 1):
        if H % th:
            continue
        vmem = (
            2 * 3 * (th + 2) * (W + 8) * max(cin, 128) * 2  # double-buffered x
            + th * W * max(cout, 128) * (4 + 2 * 2)  # f32 acc + 2 out slots
            + 27 * max(cin, 128) * max(cout, 128) * 2  # resident taps
        )
        if vmem <= 96 * 2**20:
            best = th
            break
    return best


@functools.partial(jax.jit, static_argnames=("kt", "out_dtype", "interpret"))
def conv3d_causal_taps(x, w, b, *, kt: int = 3, out_dtype=jnp.bfloat16, interpret: bool = False):
    """x: (B, T_in, H, W, Cin) with T_in = T_out + kt - 1 (taps pre-stacked,
    e.g. the streaming cache concat); w: (kt, 3, 3, Cin, Cout); b: (Cout,).

    Equals lax.conv_general_dilated(x, w, valid-in-time, SAME-1 spatially).
    Requires W % 8 == 0 (true for all Wan latent/pixel widths).
    """
    B, T_in, H, W, Cin = x.shape
    assert B == 1, "VAE decode runs B=1; fold batch into T upstream"
    assert W % 8 == 0, W
    T_out = T_in - kt + 1
    Cout = w.shape[-1]

    # Mosaic requires the lane dim of sliced VMEM refs to be 128-aligned;
    # zero-pad channels (zero taps contribute nothing to the accumulator).
    cin_p = -(-Cin // 128) * 128
    cout_p = -(-Cout // 128) * 128
    if cin_p != Cin or cout_p != Cout:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cin_p - Cin),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, cin_p - Cin), (0, cout_p - Cout)))
        b = jnp.pad(b, (0, cout_p - Cout))
        out = conv3d_causal_taps(x, w, b, kt=kt, out_dtype=out_dtype, interpret=interpret)
        return out[..., :Cout]
    th = _pick_th(H, W, Cin, Cout)

    # H: SAME halo pad; W: 1 left + 7 right so every roll-slice is aligned
    xp = jnp.pad(x[0], ((0, 0), (1, 1), (1, 7), (0, 0)))

    n_i = H // th
    grid = (T_out, n_i)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, kt=kt, th=th, W=W, n_i=n_i),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, manual DMA
            pl.BlockSpec((kt, 3, 3, Cin, Cout), lambda t, i: (0, 0, 0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda t, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, Cout), lambda t, i: (t, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T_out, H, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kt, th + 2, W + 8, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(xp, w, b.reshape(1, Cout))
    return out[None]


def _conv_kernel_folded(x_hbm, wf_ref, b_ref, out_ref, xbuf, sems, *, kt: int, th: int, W: int, n_i: int):
    """K-folded variant: the kt*3 (dt, dh) taps are concatenated on the
    lane (channel) dim into one (th, W+8, kt*3*Cin) slab, so the band runs
    THREE accumulated matmuls (one per dw shift) with K = kt*3*Cin instead
    of kt*9 matmuls with K = Cin. The f32 accumulator is read-modified-
    written 3x instead of 27x and the MXU sees a 9x deeper K — the
    accumulator/relayout VMEM traffic that capped the per-tap kernel near
    40 TF/s (module docstring) drops ~2.3x."""
    t = pl.program_id(0)
    i = pl.program_id(1)
    g = t * n_i + i

    def start_fetch(t_, i_, slot):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(t_, kt), pl.ds(i_ * th, th + 2)],
            xbuf.at[slot],
            sems.at[slot],
        ).start()

    @pl.when(g == 0)
    def _():
        start_fetch(t, i, 0)

    nxt = g + 1
    @pl.when(nxt < pl.num_programs(0) * n_i)
    def _():
        start_fetch(nxt // n_i, nxt % n_i, nxt % 2)

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(t, kt), pl.ds(i * th, th + 2)], xbuf.at[g % 2], sems.at[g % 2]
    ).wait()

    x = xbuf[g % 2]  # (kt, th+2, W+8, Cin)
    cin = x.shape[-1]
    cout = out_ref.shape[-1]
    # (dt, dh)-fold on lanes; parts are 128-aligned so this is vreg copies
    slab = jnp.concatenate(
        [x[dt, dh : dh + th] for dt in range(kt) for dh in range(3)], axis=-1
    )  # (th, W+8, kt*3*cin)
    acc = jnp.zeros((th * W, cout), dtype=jnp.float32)
    for dw in range(3):
        patch = slab[:, dw : dw + W, :].reshape(th * W, kt * 3 * cin)
        acc += jnp.dot(patch, wf_ref[dw], preferred_element_type=jnp.float32)
    out = acc + b_ref[0].astype(jnp.float32)
    out_ref[...] = out.reshape(1, th, W, cout).astype(out_ref.dtype)


def _pick_th_folded(H: int, W: int, cin: int, cout: int, kt: int) -> int:
    """Row-band height for the folded kernel: the slab is the extra tenant."""
    best = 1
    for th in (16, 8, 4, 2, 1):
        if H % th:
            continue
        vmem = (
            2 * kt * (th + 2) * (W + 8) * max(cin, 128) * 2  # double-buffered x
            + th * (W + 8) * kt * 3 * max(cin, 128) * 2  # folded slab
            + th * W * max(cout, 128) * (4 + 2 * 2)  # f32 acc + 2 out slots
            + 3 * kt * 3 * max(cin, 128) * max(cout, 128) * 2  # folded taps
        )
        if vmem <= 96 * 2**20:
            best = th
            break
    return best


@functools.partial(jax.jit, static_argnames=("kt", "out_dtype", "interpret"))
def conv3d_causal_folded(x, w, b, *, kt: int = 3, out_dtype=jnp.bfloat16, interpret: bool = False):
    """K-folded implicit-GEMM causal conv — same contract as
    :func:`conv3d_causal_taps` (x: (1, T_out+kt-1, H, W, Cin) with taps
    pre-stacked, valid-in-time, SAME-1 spatially; W % 8 == 0)."""
    B, T_in, H, W, Cin = x.shape
    assert B == 1, "VAE decode runs B=1; fold batch into T upstream"
    assert W % 8 == 0, W
    T_out = T_in - kt + 1
    Cout = w.shape[-1]

    cin_p = -(-Cin // 128) * 128
    cout_p = -(-Cout // 128) * 128
    if cin_p != Cin or cout_p != Cout:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cin_p - Cin),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, cin_p - Cin), (0, cout_p - Cout)))
        b = jnp.pad(b, (0, cout_p - Cout))
        out = conv3d_causal_folded(x, w, b, kt=kt, out_dtype=out_dtype, interpret=interpret)
        return out[..., :Cout]
    th = _pick_th_folded(H, W, Cin, Cout, kt)

    xp = jnp.pad(x[0], ((0, 0), (1, 1), (1, 7), (0, 0)))
    # (kt, 3dh, 3dw, Cin, Cout) -> (3dw, kt*3dh*Cin, Cout), row order
    # matching the kernel's dt-major/dh-minor lane concat
    wf = jnp.transpose(w, (2, 0, 1, 3, 4)).reshape(3, kt * 3 * Cin, Cout)

    n_i = H // th
    grid = (T_out, n_i)
    out = pl.pallas_call(
        functools.partial(_conv_kernel_folded, kt=kt, th=th, W=W, n_i=n_i),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, kt * 3 * Cin, Cout), lambda t, i: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda t, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, Cout), lambda t, i: (t, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T_out, H, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, kt, th + 2, W + 8, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(xp, wf, b.reshape(1, Cout))
    return out[None]


def _conv_kernel_ring(x_hbm, w_ref, b_ref, out_ref, xbuf, sems, *, kt: int, th: int, W: int, T_in: int):
    """Frame-ring variant: grid (row band i OUTER, frame t INNER), per-frame
    DMA into a (kt+2)-slot ring, so each input frame-band is fetched ONCE
    per band instead of kt times (the per-tap kernel's sliding (t..t+kt-1)
    window re-reads every frame kt times — with the kernel input-DMA-bound
    at decoder shapes, that redundancy IS the bottleneck, docs/PERF.md
    "K-folded" section). Steady state keeps two frames in flight (prefetch
    distance 2), so the single-frame DMA still hides under the band's
    kt*9 matmuls."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    R = kt + 2  # ring slots: kt live taps + 2 prefetch slots

    def fetch(f, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(f, 1), pl.ds(i * th, th + 2)],
            xbuf.at[pl.ds(slot, 1)],
            sems.at[slot],
        )

    @pl.when(t == 0)
    def _():
        # new band: fetch the first kt taps + both prefetch slots
        for f in range(min(R, T_in)):  # static unroll (R, T_in are constants)
            fetch(f, f % R).start()
        for f in range(kt):
            fetch(f, f).wait()

    @pl.when(t > 0)
    def _():
        # frame t+kt-1 entered flight two steps ago; the next prefetch
        # keeps the pipe two frames deep
        f_new = t + kt - 1
        fetch(f_new, f_new % R).wait()
        f_pre = t + kt + 1
        @pl.when(f_pre < T_in)
        def _():
            fetch(f_pre, f_pre % R).start()

    cin = xbuf.shape[-1]
    cout = out_ref.shape[-1]
    acc = jnp.zeros((th * W, cout), dtype=jnp.float32)
    for dt in range(kt):
        xf = xbuf[(t + dt) % R]  # dynamic leading index into the ring
        for dw in range(3):
            for dh in range(3):
                patch = xf[dh : dh + th, dw : dw + W, :].reshape(th * W, cin)
                acc += jnp.dot(patch, w_ref[dt, dh, dw], preferred_element_type=jnp.float32)
    out = acc + b_ref[0].astype(jnp.float32)
    out_ref[...] = out.reshape(1, th, W, cout).astype(out_ref.dtype)


def _pick_th_ring(H: int, W: int, cin: int, cout: int, kt: int) -> int:
    """Row-band height for the ring kernel: kt+2 single-frame slots."""
    best = 1
    for th in (16, 8, 4, 2, 1):
        if H % th:
            continue
        vmem = (
            (kt + 2) * (th + 2) * (W + 8) * max(cin, 128) * 2  # frame ring
            + th * W * max(cout, 128) * (4 + 2 * 2)  # f32 acc + 2 out slots
            + 27 * max(cin, 128) * max(cout, 128) * 2  # resident taps
        )
        if vmem <= 96 * 2**20:
            best = th
            break
    return best


@functools.partial(jax.jit, static_argnames=("kt", "out_dtype", "interpret"))
def conv3d_causal_ring(x, w, b, *, kt: int = 3, out_dtype=jnp.bfloat16, interpret: bool = False):
    """Frame-ring implicit-GEMM causal conv — same contract as
    :func:`conv3d_causal_taps` (x: (1, T_out+kt-1, H, W, Cin) with taps
    pre-stacked, valid-in-time, SAME-1 spatially; W % 8 == 0), with input
    HBM traffic cut from kt reads of every frame to one."""
    B, T_in, H, W, Cin = x.shape
    assert B == 1, "VAE decode runs B=1; fold batch into T upstream"
    assert W % 8 == 0, W
    T_out = T_in - kt + 1
    Cout = w.shape[-1]

    cin_p = -(-Cin // 128) * 128
    cout_p = -(-Cout // 128) * 128
    if cin_p != Cin or cout_p != Cout:
        x = jnp.pad(x, ((0, 0),) * 4 + ((0, cin_p - Cin),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, cin_p - Cin), (0, cout_p - Cout)))
        b = jnp.pad(b, (0, cout_p - Cout))
        out = conv3d_causal_ring(x, w, b, kt=kt, out_dtype=out_dtype, interpret=interpret)
        return out[..., :Cout]
    th = _pick_th_ring(H, W, Cin, Cout, kt)

    xp = jnp.pad(x[0], ((0, 0), (1, 1), (1, 7), (0, 0)))

    n_i = H // th
    grid = (n_i, T_out)  # band-major: the frame ring lives within one band
    out = pl.pallas_call(
        functools.partial(_conv_kernel_ring, kt=kt, th=th, W=W, T_in=T_in),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kt, 3, 3, Cin, Cout), lambda i, t: (0, 0, 0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, Cout), lambda i, t: (t, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T_out, H, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kt + 2, th + 2, W + 8, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((kt + 2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(xp, w, b.reshape(1, Cout))
    return out[None]


def conv3d_causal_taps_xla(x, w, b, *, kt: int = 3, out_dtype=jnp.bfloat16):
    """Pure-XLA tap decomposition: kt*3*3 shifted GEMMs, accumulated.

    Same contract as :func:`conv3d_causal_taps` (x carries kt-1 context
    frames; SAME-1 spatial padding) but lowered as plain dot_generals so
    XLA schedules it — unlike the pallas_call, programs built from it
    keep overlapping with the host spool's async D2H pulls, and GSPMD can
    partition it. Nothing larger than one shifted copy of x materializes
    (vs im2col's kt*9*C patch tensor). See scripts/vae_conv_micro3.py for
    the measured comparison vs the XLA conv emitter.
    """
    B, T_in, H, W, Cin = x.shape
    T = T_in - kt + 1
    Cout = w.shape[-1]
    xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dt in range(kt):
        for dh in range(3):
            for dw in range(3):
                xs = jax.lax.slice(
                    xpad, (0, dt, dh, dw, 0), (B, dt + T, dh + H, dw + W, Cin)
                )
                o = jax.lax.dot_general(
                    xs.reshape(-1, Cin),
                    w[dt, dh, dw],
                    (((1,), (0,)), ((), ())),
                    # f32 running sum: 26 bf16 partial-sum roundings would
                    # add ~1% noise the XLA-conv and Pallas backends (both
                    # f32 accumulators) don't have
                    preferred_element_type=jnp.float32,
                )
                out = o if out is None else out + o
    return (out.reshape(B, T, H, W, Cout) + b.astype(jnp.float32)).astype(out_dtype)


def conv3d_causal_taps_reference(x, w, b, *, kt: int = 3, out_dtype=jnp.bfloat16):
    """XLA conv with the same contract (for parity tests / fallback)."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(out_dtype)
