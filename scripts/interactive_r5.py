"""Round-5 interactive ladder: head-major cache + sparse cache window + nb.

One process, four measurements at 352x640 (latent 44x80), cache 16:
  1. dense nb=1  — the r4 configuration re-measured on the head-major
     cache layout (the full-cache relayout per attention call is gone)
  2. window nb=1 — sparse cache window, production-scaled GNA rows
     (window 12 rows of the 44-row base grid -> 7 rows at the 22-row
     token grid, NATTEN-clamped; ops/flash_attention kv_cache_window)
  3. dense nb=2  — two frames per block (the reference's
     num_frame_per_block lever: amortizes cache reads, fills the MXU)
  4. window nb=2 — both composed

Real-time = 16 pixel fps = 4 latent frames/s.
Run: python scripts/interactive_r5.py [--hw 44 80] [--blocks 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(44, 80))
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--cache-frames", type=int, default=16)
    ap.add_argument("--window", type=int, default=7)
    args = ap.parse_args()

    from interactive_latency import measure

    rows = []
    for name, nb, win in (
        ("dense_nb1", 1, -1),
        ("window_nb1", 1, args.window),
        ("dense_nb2", 2, -1),
        ("window_nb2", 2, args.window),
    ):
        try:
            r = measure(
                tuple(args.hw), blocks=args.blocks, cache_frames=args.cache_frames,
                frames_per_block=nb, cache_window_rows=win,
            )
            rows.append({"config": name, **{k: v for k, v in r.items() if k != "laps"}})
            print(f"[r5] {name}: {r['pixel_fps']:.1f} pixel fps (p50 {r['p50_s']*1e3:.0f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[r5] {name} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            rows.append({"config": name, "error": str(e)[:200]})
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
