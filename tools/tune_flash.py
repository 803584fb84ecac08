"""Flash-attention block-size sweep on the real TPU (VERDICT r3 item 4:
flash block_q/block_k were chosen at 4k and never retuned at 16k).

Benches the Pallas flash kernel fwd-only and fwd+bwd (value_and_grad) at the
training shape across candidate (block_q, block_k) pairs and prints a table.
The decoder's training tier reads cfg.attn_chunk_size for both dims
(models/decoder.py:336-338); inference prefill reads cfg.flash_block_size.

Usage:
  python tools/tune_flash.py --seq 16384 --heads 16 --kv-heads 8 --dim 128
  python tools/tune_flash.py --seq 4096
"""

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=16384)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--kv-heads", type=int, default=8)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--blocks", type=int, nargs="+",
                   default=[256, 512, 1024, 2048])
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/leopard_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from leopard_tpu.ops.pallas.flash_attention import flash_attention

    b, s, hq, hkv, d = (args.batch, args.seq, args.heads, args.kv_heads,
                        args.dim)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, s, hq, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, hkv, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, hkv, d), jnp.bfloat16)

    # causal attention FLOPs: 2 dots (qk + pv) over the lower triangle
    flops = 2 * 2 * b * hq * d * s * (s + 1) / 2

    def bench(fn, *a):
        np.asarray(jax.tree_util.tree_leaves(fn(*a))[0][0, 0])  # compile+sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
        return (time.perf_counter() - t0) / args.iters

    results = []
    for bq, bk in itertools.product(args.blocks, args.blocks):
        if s % bq or s % bk:
            continue

        @jax.jit
        def fwd(q, k, v, bq=bq, bk=bk):
            return flash_attention(q, k, v, causal=True, block_q=bq,
                                   block_k=bk)

        @jax.jit
        def fwdbwd(q, k, v, bq=bq, bk=bk):
            def loss(q, k, v):
                o = flash_attention(q, k, v, causal=True, block_q=bq,
                                    block_k=bk)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        try:
            t_f = bench(fwd, q, k, v)
            t_fb = bench(fwdbwd, q, k, v)
        except Exception as e:  # noqa: BLE001 — OOM/VMEM limits are data
            print(f"bq={bq:5d} bk={bk:5d}  FAILED: {str(e)[:90]}")
            continue
        results.append((bq, bk, t_f, t_fb))
        print(
            f"bq={bq:5d} bk={bk:5d}  fwd {t_f*1e3:7.2f} ms "
            f"({flops/t_f/1e12:5.1f} TF/s)   fwd+bwd {t_fb*1e3:7.2f} ms "
            f"({3.5*flops/t_fb/1e12:5.1f} TF/s eff)",
            flush=True,
        )

    if results:
        best_f = min(results, key=lambda r: r[2])
        best_fb = min(results, key=lambda r: r[3])
        print(f"\nbest fwd     : bq={best_f[0]} bk={best_f[1]} "
              f"{best_f[2]*1e3:.2f} ms")
        print(f"best fwd+bwd : bq={best_fb[0]} bk={best_fb[1]} "
              f"{best_fb[3]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
