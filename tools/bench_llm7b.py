"""Qwen2.5-7B-scale w4 decode throughput across the fusion tiers, one chip.

Measures the launch-fusion ladder end-to-end (greedy decode as one jitted
scan, so the tunnel's per-dispatch RTT is amortized over the whole decode):

  unfused      — one pallas launch per quantized matmul (~200/token)
  concat       — qkv + gateup concat fusion (fuse_quantized_layers, ~113)
  +swiglu      — concat + the single-launch SwiGLU-MLP megakernel
  +postattn    — concat + the post-attention megakernel (2 launches/layer)

plus, at the best tier: B=4 aggregate decode and best-of-n sampling (N=8,
one shared prompt pass — reference run_llm.py:201-330 pays the prompt N
times through HF generate).

Weights are random-init (no checkpoints in this environment) — decode
throughput is weight-streaming bound, so numerics don't matter for timing;
the megakernel/fusion NUMERICS are pinned separately in tests/test_quant.py
and tests/test_llm.py.

Usage:  python tools/bench_llm7b.py [--tokens 64] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp

import vla_touch_tpu.planning.llm as L
from vla_touch_tpu.ops.quant import quantize_tree_w4


def build_w4_tree(cfg: L.LLMConfig, seed: int = 0) -> dict:
    """7B w4 tree built layer-by-layer ON DEVICE: peak transient is one
    bf16 layer (~0.5 GB) + its packed output, same discipline as
    load_llm_from_hf's streaming quantizer."""
    qt = jax.jit(quantize_tree_w4)
    key = jax.random.PRNGKey(seed)
    D, hd = cfg.hidden_size, cfg.head_dim

    def dense(k, din, dout, bias):
        p = {"kernel": jax.random.normal(k, (din, dout), jnp.bfloat16) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((dout,), jnp.float32)
        return p

    def _pace(quantized):
        # block_until_ready is a no-op on the tunnel backend (see _fetch),
        # so pace the layer-by-layer peak-memory discipline the same way:
        # host-fetch a tiny reduction of one quantized leaf — the fetch
        # cannot land before the whole layer's quantize completes.
        leaf = jax.tree.leaves(quantized)[0]
        jax.device_get(jnp.sum(leaf.astype(jnp.float32)))
        return quantized

    layers = []
    for i in range(cfg.num_layers):
        key, kq, kk, kv, ko, kg, ku, kd = jax.random.split(key, 8)
        lp = {
            "input_norm": jnp.ones((D,), jnp.float32),
            "q": dense(kq, D, cfg.num_heads * hd, cfg.qkv_bias),
            "k": dense(kk, D, cfg.num_kv_heads * hd, cfg.qkv_bias),
            "v": dense(kv, D, cfg.num_kv_heads * hd, cfg.qkv_bias),
            "o": dense(ko, cfg.num_heads * hd, D, False),
            "post_norm": jnp.ones((D,), jnp.float32),
            "gate": dense(kg, D, cfg.mlp_dim, False),
            "up": dense(ku, D, cfg.mlp_dim, False),
            "down": dense(kd, cfg.mlp_dim, D, False),
        }
        layers.append(_pace(qt(lp)))
    key, ke, kh = jax.random.split(key, 3)
    params = {
        "layers": layers,
        "embed": jax.random.normal(ke, (cfg.vocab_size, D), jnp.bfloat16)
        * 0.02,
        "final_norm": jnp.ones((D,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _pace(qt(dense(kh, D, cfg.vocab_size, False)))
    return params


def make_decoder(cfg, T, *, swiglu, postattn, N=1, temperature=None):
    """A fresh jit of the decode loop with the megakernel dispatch pinned
    to the requested tier (the _ok predicates are consulted at TRACE time,
    so each tier gets its own jit object and compiles under the patch)."""
    fn = jax.jit(partial(
        L._generate_impl, cfg, max_new_tokens=T, eos_id=-1, lora=None,
        temperature=temperature, num_return_sequences=N))

    def run(params, prompt, key):
        orig_s, orig_p = L._swiglu_megakernel_ok, L._postattn_megakernel_ok
        orig_m = L.MEGAKERNELS
        L.MEGAKERNELS = swiglu or postattn     # megakernels default OFF
        if not swiglu:
            L._swiglu_megakernel_ok = lambda lp, lo: False
        if not postattn:
            L._postattn_megakernel_ok = lambda lp, lo: False
        try:
            return fn(params, prompt, key=key)
        finally:
            L._swiglu_megakernel_ok = orig_s
            L._postattn_megakernel_ok = orig_p
            L.MEGAKERNELS = orig_m

    return run


def _fetch(out):
    """Force completion by pulling the (tiny) token array to host.

    block_until_ready is NOT reliable on the experimental tunnel backend
    (returns before the computation lands); a device_get of an output is —
    the transfer cannot produce data before the decode finishes, and the
    token array is ~2 KB so transfer time is noise vs a 7B decode."""
    import numpy as np
    return int(np.asarray(jax.device_get(out[0])).sum())


def time_decode(run, params, prompt, key, T, iters=3):
    out = run(params, prompt, key)
    _fetch(out)                                      # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(params, prompt, key)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    B = prompt.shape[0]
    N = out[0].shape[0] // B
    return {"s": round(best, 4), "tok_s": round(T / best, 1),
            "agg_tok_s": round(B * N * T / best, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument("--tiers", default="unfused,concat,swiglu,postattn")
    args = ap.parse_args()

    cfg = L.qwen25_7b()
    T, Lp = args.tokens, args.prompt_len
    key = jax.random.PRNGKey(1)
    prompt = jax.random.normal(key, (1, Lp, cfg.hidden_size),
                               jnp.bfloat16) * 0.02

    results = {"config": "qwen2.5-7b-arch w4", "tokens": T,
               "prompt_len": Lp, "device": str(jax.devices()[0])}
    t0 = time.perf_counter()
    params = build_w4_tree(cfg)
    print(f"built w4 tree in {time.perf_counter() - t0:.1f}s", flush=True)

    tiers = args.tiers.split(",")
    if "unfused" in tiers:
        run = make_decoder(cfg, T, swiglu=False, postattn=False)
        results["unfused_b1"] = time_decode(run, params, prompt, key, T,
                                            args.iters)
        print("unfused  b1:", results["unfused_b1"], flush=True)

    fused = L.fuse_quantized_layers(params)
    # Both trees stay resident (~7.6 GB w4 at 7B, shared embed) so the
    # B=4 / N=8 runs below can use whichever tier measured fastest.

    if "concat" in tiers:
        run = make_decoder(cfg, T, swiglu=False, postattn=False)
        results["concat_b1"] = time_decode(run, fused, prompt, key, T,
                                           args.iters)
        print("concat   b1:", results["concat_b1"], flush=True)

    if "swiglu" in tiers:
        run = make_decoder(cfg, T, swiglu=True, postattn=False)
        results["swiglu_b1"] = time_decode(run, fused, prompt, key, T,
                                           args.iters)
        print("+swiglu  b1:", results["swiglu_b1"], flush=True)

    if "postattn" in tiers:
        run = make_decoder(cfg, T, swiglu=True, postattn=True)
        results["postattn_b1"] = time_decode(run, fused, prompt, key, T,
                                             args.iters)
        print("+postattn b1:", results["postattn_b1"], flush=True)

    # B=4 aggregate decode + best-of-n sampling at the FASTEST measured
    # tier (2026-08 v5e measurement: that is the UNFUSED per-matmul w4
    # kernel — every fusion tier loses; see ROUND_NOTES).
    tier_flags = {"unfused_b1": (False, False, "unfused"),
                  "concat_b1": (False, False, "concat"),
                  "swiglu_b1": (True, False, "swiglu"),
                  "postattn_b1": (True, True, "postattn")}
    done = [(results[k]["s"], k) for k in tier_flags if k in results]
    if done:
        _, best_key = min(done)
        swiglu, postattn, tname = tier_flags[best_key]
        best_params = params if tname == "unfused" else fused
        results["best_tier"] = tname

        prompt4 = jnp.broadcast_to(prompt, (4, Lp, cfg.hidden_size))
        run4 = make_decoder(cfg, T, swiglu=swiglu, postattn=postattn)
        results["best_b4"] = time_decode(run4, best_params, prompt4, key, T,
                                         args.iters)
        print(f"{tname} b4:", results["best_b4"], flush=True)

        runN = make_decoder(cfg, T, swiglu=swiglu, postattn=postattn, N=8,
                            temperature=0.7)
        results["best_b1_n8_sampled"] = time_decode(
            runN, best_params, prompt, key, T, args.iters)
        print(f"{tname} b1 N=8 sampled:", results["best_b1_n8_sampled"],
              flush=True)

    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
