"""Capacity probe: the int8 fused query program at 2x the headline scale.

10M multiscale vectors (the BASELINE north star) occupy 5GB as int8 —
one v5e chip (16GB HBM) has room for ~20M rows plus workspace, a regime
bf16 cannot reach (20M x 512 x 2B = 20.5GB). This measures the full
re-rank program (matvec + distinct-frame shortlist + augmentation +
top-k, per-row int8 scales) at 20M rows via bench.bench_rerank's chained
methodology. Cold compile of the 20M chain is ~6min (new shapes for the
persistent cache); the probe is standalone evidence, NOT a bench stage.

Usage: timeout 1200 python scripts/probe_int8_capacity.py > /tmp/cap.log 2>&1
"""
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    import jax

    # ONE size per process (pass millions as argv[1], default 20): a failed
    # larger attempt leaves device buffers pinned by the exception traceback
    # and poisons smaller retries in the same process
    n = int(sys.argv[1]) * 1_000_000 if len(sys.argv) > 1 else 20_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "matvec"
    print("devices:", jax.devices(), flush=True)
    bench._enable_compile_cache()
    try:
        if mode == "batch":
            # concurrency AT capacity: Q=16 sessions, per-frame int8 scales
            out = bench.bench_multi_query(n, dtype="int8_frame")
            print(f"[{n//1_000_000}M int8_frame batch] {out}", flush=True)
        else:
            out = bench.bench_rerank(n, dtype="int8")
            print(f"[{n//1_000_000}M int8] device_ms={out['device_ms']:.3f} "
                  f"wall p50={out['p50_ms']:.1f} p90={out['p90_ms']:.1f} "
                  f"n={out['n_vectors']}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{n//1_000_000}M {mode}] FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
