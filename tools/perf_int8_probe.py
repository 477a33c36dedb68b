"""Microbench: int8 W8A8 vs bf16 BasicBlock branch chains on TPU.

Validates the PERF.md round-2 estimate (int8 trunk ~1.29x) including the
quantize/requantize epilogues the real path pays.  Uses the bench.py
methodology: lax.scan chunks per dispatch, value-fetch timing, RTT floor
subtracted.

    python tools/perf_int8_probe.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
CHUNK = 8
DISPATCHES = 4


def timed(fn, *args) -> float:
    """ms per chunk-step (CHUNK model steps per dispatch)."""
    float(fn(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(DISPATCHES):
        acc = fn(*args)
    float(acc)
    total = time.perf_counter() - t0 - 0.03  # RTT floor
    return total / (DISPATCHES * CHUNK) * 1e3


def basic_chain_bf16(x, weights):
    for w1, b1, w2, b2 in weights:
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y + b1, 0)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(y + b2 + x, 0)
    return x


def basic_chain_int8(x, qweights):
    for (k1, s1, b1, a1), (k2, s2, b2, a2) in qweights:
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a1), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, k1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * (a1 * s1) + b1, 0)
        yq = jnp.clip(jnp.round(y / a2), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            yq, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        x = jnp.maximum(
            (acc.astype(jnp.float32) * (a2 * s2) + b2).astype(jnp.bfloat16)
            + x, 0)
    return x


def basic_chain_int8_folded(x, qweights):
    """Same math as basic_chain_int8 with the conv1->conv2 requantization
    FOLDED into conv1's epilogue: the inter-conv tensor exists only as int8
    (ReLU commutes with the positive 1/a2 scale), never as f32/bf16.  The
    block output still materializes bf16 for the residual chain — the fold
    targets the one edge per block where int8-only traffic is possible."""
    for (k1, s1, b1, a1), (k2, s2, b2, a2) in qweights:
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a1), -127, 127
                      ).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, k1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        # fused epilogue: dequant+bias+relu+requant as one affine+clip, int8 out
        yq = jnp.clip(jnp.round(jnp.maximum(
            acc.astype(jnp.float32) * (a1 * s1 / a2) + b1 / a2, 0.0)),
            0, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            yq, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        x = jnp.maximum(
            (acc.astype(jnp.float32) * (a2 * s2) + b2).astype(jnp.bfloat16)
            + x, 0)
    return x


def bench_branch(h, w, c, n_blocks=4):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(CHUNK, BATCH, h, w, c)),
                    jnp.bfloat16)
    weights, qweights = [], []
    for _ in range(n_blocks):
        pair_q, pair = [], []
        for _ in range(2):
            k = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.05
            b = rng.normal(size=(c,)).astype(np.float32) * 0.01
            pair.append((jnp.asarray(k, jnp.bfloat16),
                         jnp.asarray(b, jnp.bfloat16)))
            ws = np.abs(k).reshape(-1, c).max(0) / 127.0
            kq = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
            pair_q.append((jnp.asarray(kq), jnp.asarray(ws, jnp.float32),
                           jnp.asarray(b), jnp.float32(3.0 / 127)))
        weights.append(tuple(p for pr in pair for p in pr))
        qweights.append(tuple(pair_q))

    @jax.jit
    def run_bf16(x, weights):
        def step(carry, xi):
            return carry + jnp.sum(
                basic_chain_bf16(xi, weights).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), x)
        return acc

    @jax.jit
    def run_int8(x, qweights):
        def step(carry, xi):
            return carry + jnp.sum(
                basic_chain_int8(xi, qweights).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), x)
        return acc

    @jax.jit
    def run_int8_folded(x, qweights):
        def step(carry, xi):
            return carry + jnp.sum(
                basic_chain_int8_folded(xi, qweights).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), x)
        return acc

    t_bf = timed(run_bf16, x, tuple(weights))
    t_i8 = timed(run_int8, x, tuple(qweights))
    t_f = timed(run_int8_folded, x, tuple(qweights))
    print(f"  {h}x{w}x{c} (B={BATCH}, {n_blocks} blocks): "
          f"bf16 {t_bf:.3f} ms  int8 {t_i8:.3f} ms  "
          f"int8-folded {t_f:.3f} ms  "
          f"speedup {t_bf / t_i8:.2f}x / folded {t_bf / t_f:.2f}x",
          flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # w32 stage3/4 branch shapes @256x256 input
    for h, w, c in ((64, 64, 32), (32, 32, 64), (16, 16, 128), (8, 8, 256)):
        bench_branch(h, w, c)


if __name__ == "__main__":
    main()
