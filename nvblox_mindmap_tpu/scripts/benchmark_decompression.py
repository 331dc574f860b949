"""Benchmark zstd feature-mesh decode throughput (reference:
scripts/benchmark_decompression.py). The dataset hot loop decodes one
zstd-pickled vertex dict per sample; this measures levels / sizes."""
from __future__ import annotations

import argparse
import io
import pickle
import time

import numpy as np
import zstandard


def benchmark(n_vertices: int = 2048, channels: int = 768, levels=(1, 3, 9),
              repeats: int = 20):
    rng = np.random.default_rng(0)
    payload = {
        "vertices": rng.normal(size=(n_vertices, 3)).astype(np.float16),
        "features": rng.normal(size=(n_vertices, channels)).astype(np.float16),
        "channel_length": channels,
    }
    raw = pickle.dumps(payload)
    results = {}
    for level in levels:
        cctx = zstandard.ZstdCompressor(level=level)
        blob = cctx.compress(raw)
        dctx = zstandard.ZstdDecompressor()
        t0 = time.perf_counter()
        for _ in range(repeats):
            pickle.loads(dctx.decompress(blob))
        dt = (time.perf_counter() - t0) / repeats
        results[level] = {
            "compressed_mb": len(blob) / 1e6,
            "ratio": len(raw) / len(blob),
            "decode_ms": dt * 1000,
            "decode_gbps": len(raw) / dt / 1e9,
        }
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_vertices", type=int, default=2048)
    parser.add_argument("--channels", type=int, default=768)
    args = parser.parse_args(argv)
    for level, stats in benchmark(args.n_vertices, args.channels).items():
        print(
            f"level {level}: {stats['compressed_mb']:.2f} MB "
            f"(x{stats['ratio']:.2f}), {stats['decode_ms']:.2f} ms, "
            f"{stats['decode_gbps']:.2f} GB/s"
        )


if __name__ == "__main__":
    main()
