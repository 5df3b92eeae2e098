"""VAE decode/encode roofline analysis on the real chip (VERDICT r2 #1).

The distilled (DMD2 4-step) clip spends ~40% of its wall-clock in the
streaming VAE decode (PERF.md), which had no perf analysis. This script
measures, per streaming chunk and end-to-end:

  * FLOPs + HBM bytes from XLA's own cost model (compiled.cost_analysis())
  * achieved TF/s vs the chip's bf16 peak, and achieved GB/s vs HBM peak
    -> which roofline regime each chunk is in
  * chunk-size sweep (1/2/4 latent frames per dispatch)
  * host-spool overlap: async dispatch of chunk i+1 before the D2H of
    chunk i (decode_streaming out="host_async")

Matches the reference's treatment of tokenizer perf as first-class
(predict2/utils/tokenizer_benchmarking.py, BenchmarkTimes in
wan2pt1.py:817-880).

Run: python scripts/vae_bench.py [chunks|e2e|attn]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

# full-scale 720p geometry: 93 frames @ 704x1280 <-> latent (24, 88, 160)
LAT_T, LAT_H, LAT_W = 24, 88, 160
PIX_H, PIX_W = 704, 1280
N_FRAMES = 93

HBM_GBPS = {"TPU v5 lite": 819e9, "TPU v5": 2765e9, "TPU v4": 1228e9, "TPU v6": 1640e9}
PEAKS = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12, "TPU v6": 918e12}


def chip():
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAKS.items() if kind.startswith(k)), 197e12)
    bw = next((v for k, v in HBM_GBPS.items() if kind.startswith(k)), 819e9)
    return kind, peak, bw


def make_vae():
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    cfg = WanVAEConfig(dtype=jnp.bfloat16)
    net = WanVAE(cfg)
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 64, 64, 3), jnp.bfloat16)))
    keys = iter(jax.random.split(jax.random.PRNGKey(7), len(jax.tree.leaves(shapes))))
    params = jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.05).astype(s.dtype), shapes
    )
    return cfg, params


from cosmos_predict2_tpu.utils.benchmarking import sync  # noqa: E402


def run_chunks(sizes=(1, 2, 4)):
    """Per-chunk cost model + timing at the given chunk sizes."""
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg, params = make_vae()
    kind, peak, bw = chip()
    print(f"[chip] {kind}: bf16 peak {peak/1e12:.0f} TF/s, HBM {bw/1e9:.0f} GB/s", flush=True)

    for nlat in sizes:
        z = jax.random.normal(jax.random.PRNGKey(0), (1, nlat, LAT_H, LAT_W, 16), dtype=jnp.bfloat16)
        fn = wvs._jitted_chunk("dec", cfg, first=False)
        # cost model from ABSTRACT shapes: a concrete cache pytree held
        # alive next to the running one would double ~4.3 GiB of HBM
        abstract = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (params, z))
        caches_abs = jax.eval_shape(lambda: wvs.init_decoder_state(cfg, 1, LAT_H, LAT_W, dtype=cfg.dtype).caches)
        compiled = fn.lower(abstract[0], abstract[1], caches_abs).compile()
        ca = compiled.cost_analysis()
        ma = compiled.memory_analysis()
        flops = ca.get("flops", 0.0)
        bytes_ = ca.get("bytes accessed", 0.0)
        print(
            f"[dec chunk={nlat}] temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
            f"args={ma.argument_size_in_bytes/2**30:.2f} GiB out={ma.output_size_in_bytes/2**30:.2f} GiB",
            flush=True,
        )
        # warm + timed laps (donated caches update in place)
        caches = wvs.init_decoder_state(cfg, 1, LAT_H, LAT_W, dtype=cfg.dtype).caches
        px, caches = fn(params, z, caches)
        sync(px)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            px, caches = fn(params, z, caches)
            sync(px)
            times.append(time.perf_counter() - t0)
        t = float(np.min(times))
        n_chunks = (LAT_T - 1 + nlat - 1) // nlat
        print(
            f"[dec chunk={nlat}] t={t*1e3:.0f} ms  flops={flops/1e12:.2f} TF "
            f"({flops/t/1e12:.1f} TF/s, {flops/t/peak*100:.1f}% peak)  "
            f"bytes={bytes_/1e9:.2f} GB ({bytes_/t/1e9:.0f} GB/s, {bytes_/t/bw*100:.1f}% HBM)  "
            f"ai={flops/max(bytes_,1):.0f} flop/B  est_total={t*n_chunks:.1f}s",
            flush=True,
        )


def run_attn():
    """Cost of the mid attention block alone at 88x160 (dense S^2 logits)."""
    cfg, params = make_vae()
    kind, peak, bw = chip()
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    p = jax.tree.map(lambda a: a, params)["params"]["decoder"]["mid_attn"]

    for T in (1, 2, 4):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, T, LAT_H, LAT_W, 384), dtype=jnp.bfloat16)
        fn = jax.jit(lambda p, x: wvs._attn_block(p, x, jnp.bfloat16))
        compiled = fn.lower(p, x).compile()
        ca = compiled.cost_analysis()
        out = fn(p, x); sync(out)
        times = []
        for _ in range(4):
            t0 = time.perf_counter(); sync(fn(p, x)); times.append(time.perf_counter() - t0)
        t = float(np.min(times))
        print(
            f"[attn T={T}] t={t*1e3:.1f} ms  flops={ca.get('flops',0)/1e9:.1f} GF "
            f"({ca.get('flops',0)/t/1e12:.1f} TF/s)  bytes={ca.get('bytes accessed',0)/1e9:.2f} GB "
            f"({ca.get('bytes accessed',0)/t/1e9:.0f} GB/s, {ca.get('bytes accessed',0)/t/bw*100:.0f}% HBM)",
            flush=True,
        )


def run_e2e(cases=(("host_sync", 1, "float"), ("host", 1, "float"), ("host", 1, "uint8"))):
    """Whole-clip streaming decode: sync vs overlapped spool, float vs u8."""
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg, params = make_vae()
    z = jax.random.normal(jax.random.PRNGKey(0), (1, LAT_T, LAT_H, LAT_W, 16), dtype=jnp.bfloat16)

    for mode, nlat, fmt in cases:
        try:
            kw = dict(chunk_latent_frames=nlat, out=mode, pixel_format=fmt)
            out = wvs.decode_streaming(cfg, params, z, **kw)
            _ = float(np.sum(np.asarray(out[:, :1], np.float32)))
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                out = wvs.decode_streaming(cfg, params, z, **kw)
                _ = float(np.sum(np.asarray(out[:, :1], np.float32)))
                times.append(time.perf_counter() - t0)
            print(f"[e2e {mode} chunk={nlat} {fmt}] decode {N_FRAMES}f {PIX_H}x{PIX_W}: {min(times):.1f} s", flush=True)
        except Exception as e:
            print(f"[e2e {mode} chunk={nlat} {fmt}] FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


def run_convcmp(sizes=(1, 2, 4), backends=("xla", "auto")):
    """Conv backends vs XLA: per-chunk timing + whole-clip decode.

    backends: "xla" (conv emitter), "auto" (Pallas implicit-GEMM kernel),
    "taps" (pure-XLA tap-sum GEMMs — overlap-friendly, see
    scripts/vae_conv_micro3.py)."""
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg, params = make_vae()
    kind, peak, bw = chip()
    print(f"[chip] {kind}: bf16 peak {peak/1e12:.0f} TF/s, HBM {bw/1e9:.0f} GB/s", flush=True)

    z_full = jax.random.normal(jax.random.PRNGKey(0), (1, LAT_T, LAT_H, LAT_W, 16), dtype=jnp.bfloat16)
    # conv_backend is passed EXPLICITLY so the "auto" (Pallas) row really
    # measures the Pallas kernel on the overlapped host route — without the
    # override decode_streaming's host-route resolution pins auto -> xla
    # and the row would duplicate the xla measurement.
    for backend in backends:
        for nlat in sizes:
            try:
                z = z_full[:, :nlat]
                fn = wvs._jitted_chunk("dec", cfg, first=False, conv_backend=backend)
                caches = wvs.init_decoder_state(cfg, 1, LAT_H, LAT_W, dtype=cfg.dtype).caches
                px, caches = fn(params, z, caches)
                sync(px)
                times = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    px, caches = fn(params, z, caches)
                    sync(px)
                    times.append(time.perf_counter() - t0)
                print(f"[convcmp {backend} chunk={nlat}] t={min(times)*1e3:.0f} ms", flush=True)
            except Exception as e:
                print(f"[convcmp {backend} chunk={nlat}] FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        # whole-clip decode, overlapped spool + uint8 (the production route)
        kw = dict(chunk_latent_frames=sizes[0], out="host", pixel_format="uint8", conv_backend=backend)
        out = wvs.decode_streaming(cfg, params, z_full, **kw)
        _ = float(np.sum(np.asarray(out[:, :1], np.float32)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = wvs.decode_streaming(cfg, params, z_full, **kw)
            _ = float(np.sum(np.asarray(out[:, :1], np.float32)))
            times.append(time.perf_counter() - t0)
        print(f"[convcmp {backend} e2e u8] decode {N_FRAMES}f {PIX_H}x{PIX_W}: {min(times):.1f} s", flush=True)


def run_enc(chunks=(4, 8, 12), backends=("auto", "xla", "taps")):
    """Whole-clip streaming ENCODE sweep: chunk_frames x conv backend, plus
    the uint8-native feed (fused in-program normalize) for the winner.
    Encode has sat at ~9.4 s since round 2 with no sweep of its own
    (decode got three rounds of attention); target <= 5 s (VERDICT r3)."""
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg, params = make_vae()
    kind, peak, bw = chip()
    print(f"[chip] {kind}: bf16 peak {peak/1e12:.0f} TF/s, HBM {bw/1e9:.0f} GB/s", flush=True)

    rng = np.random.default_rng(0)
    x_u8_host = rng.integers(0, 256, size=(1, N_FRAMES, PIX_H, PIX_W, 3), dtype=np.uint8)
    x_u8 = jnp.asarray(x_u8_host)
    x_f = (x_u8.astype(jnp.bfloat16) / 127.5 - 1.0)

    def lap(fn):
        out = fn()
        _ = float(np.sum(np.asarray(out[:, :1], np.float32)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            _ = float(np.sum(np.asarray(out[:, :1], np.float32)))
            times.append(time.perf_counter() - t0)
        del out
        return min(times)

    def reset():
        # each (backend, chunk) compiles fresh chunk programs whose
        # executables + donated-cache buffers accumulate in HBM; without
        # this the 2nd config onward dies RESOURCE_EXHAUSTED (seen on-chip
        # r5: first row 7.99 s, every later row OOM)
        import gc

        wvs._JIT_CACHE.clear()
        gc.collect()
        jax.clear_caches()

    for be in backends:
        for cf in chunks:
            try:
                t = lap(lambda: wvs.encode_streaming(cfg, params, x_f, chunk_frames=cf, conv_backend=be))
                print(f"[enc {be} chunk={cf}] encode {N_FRAMES}f {PIX_H}x{PIX_W}: {t:.2f} s", flush=True)
            except Exception as e:
                print(f"[enc {be} chunk={cf}] FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            reset()
    # uint8-native feed (the production pipeline route) on the default backend
    for cf in chunks:
        try:
            t = lap(lambda: wvs.encode_streaming(cfg, params, x_u8, chunk_frames=cf, pixel_format="uint8"))
            print(f"[enc auto/u8 chunk={cf}] encode {N_FRAMES}f {PIX_H}x{PIX_W}: {t:.2f} s", flush=True)
        except Exception as e:
            print(f"[enc auto/u8 chunk={cf}] FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        reset()
    # whole-path glue: host uint8 numpy -> device -> encode (what _run_dmd2 pays)
    t = lap(lambda: wvs.encode_streaming(cfg, params, jnp.asarray(x_u8_host), chunk_frames=chunks[0], pixel_format="uint8"))
    print(f"[enc auto/u8+H2D chunk={chunks[0]}] encode incl H2D: {t:.2f} s", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "chunks"
    if cmd == "chunks":
        sizes = tuple(int(a) for a in sys.argv[2:]) or (1,)
        run_chunks(sizes)
    elif cmd == "e2e":
        if len(sys.argv) > 2:
            sizes = tuple(int(a) for a in sys.argv[2:])
            run_e2e(tuple(("host", n, "uint8") for n in sizes))
        else:
            run_e2e()
    elif cmd == "enc":
        chunks = tuple(int(a) for a in sys.argv[2:]) or (4, 8, 12)
        run_enc(chunks)
    elif cmd == "attn":
        run_attn()
    elif cmd == "convcmp":
        sizes = tuple(int(a) for a in sys.argv[2:] if not a.startswith("--")) or (1, 2, 4)
        if "--kfold" in sys.argv:
            backends = ("auto", "kfold")
        elif "--taps" in sys.argv:
            backends = ("xla", "taps")
        elif "--ring" in sys.argv:
            backends = ("ptap", "ring")  # r4 per-tap production vs r5 frame-ring
        else:
            backends = ("xla", "auto")
        run_convcmp(sizes, backends)
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
