"""Synthetic random-weight model builder.

Used by benchmarks, the multi-chip dry run, and kernel tests: produces the
same param pytree as params.load_params (fast mode, dense) for any
ModelConfig without needing a model file (the environment has no network
access to fetch real checkpoints).
"""

from __future__ import annotations

import numpy as np

from rwkv_tpu.models.params import ModelConfig
from rwkv_tpu.ops.linear import Linear


def make_config(
    version: str = "7.0",
    n_vocab: int = 65536,
    n_embed: int = 768,
    n_layer: int = 12,
    head_size: int = 64,
) -> ModelConfig:
    major, minor = (int(p) for p in version.split("."))
    H = n_embed // head_size if major >= 5 else 0
    S = head_size if major >= 5 else 0
    return ModelConfig(major, minor, n_vocab, n_embed, n_layer, H, S, "FP32")


# named configs mirroring the reference's benchmark models (BASELINE.md)
PRESETS = {
    # RWKV-4 Pile 169M: L12 D768 V50277
    "169m": dict(version="4.0", n_vocab=50277, n_embed=768, n_layer=12),
    # RWKV-4 Pile 1.5B: L24 D2048 V50277
    "1b5": dict(version="4.0", n_vocab=50277, n_embed=2048, n_layer=24),
    # RWKV-7 World ~0.1B: L12 D768
    "7-0.1b": dict(version="7.0", n_vocab=65536, n_embed=768, n_layer=12),
    # RWKV-7 World 1.5B: L24 D2048
    "7-1b5": dict(version="7.0", n_vocab=65536, n_embed=2048, n_layer=24),
    # RWKV-7 World 7B-class: L32 D4096
    "7-7b": dict(version="7.0", n_vocab=65536, n_embed=4096, n_layer=32),
    # RWKV-6 World 7B: L32 D4096
    "6-7b": dict(version="6.0", n_vocab=65536, n_embed=4096, n_layer=32),
}


def random_params_device(cfg: ModelConfig, dtype=np.float32, seed: int = 0,
                         quantize: str | None = None):
    """Like random_params but materializes big leaves directly on device with
    jax.random — avoids the slow host->device transfer of GB-scale synthetic
    weights (the axon tunnel moves ~25 MB/s). Values follow the same scale
    scheme as random_params, which is what keeps activations finite; exact
    distributions don't matter for benchmarking.

    quantize='int8' synthesizes the big projections directly as int8 qfast
    Linears (codes + per-32-block scales) — never materializing a dense
    copy, so 7B-class configs fit one 16 GB chip. quantize='int4' likewise
    synthesizes packed-nibble q4fast Linears (0.5 bytes/element),
    quantize='int5' nibble+bit-plane q5fast Linears (0.625 B/elem), and
    quantize='w4a8' signed-s4 grouped-integer-dot Linears. (Real
    deployments get these layouts for free by loading an already-quantized
    model file.)"""
    import jax
    import jax.numpy as jnp

    host = random_params(cfg, dtype=np.float32, seed=seed, shapes_only=True)

    if quantize in ("int8", "int4", "int4bc", "int5") or (
            isinstance(quantize, str)
            and (quantize.startswith("w4a8") or quantize.startswith("w5a8"))):
        import math

        from rwkv_tpu.ops.linear import Linear

        layers = dict(host["layers"])
        for i, k in enumerate(
            ("att_k", "att_v", "att_r", "att_o", "att_gate", "ffn_k", "ffn_v", "ffn_r")
        ):
            lin = layers.get(k)
            if not isinstance(lin, Linear):
                continue
            L_, inn, out = lin.w.shape
            kq = jax.random.fold_in(jax.random.PRNGKey(seed), 1000 + i)
            if quantize in ("int4", "int4bc"):
                # two uniform nibbles per byte; unpacked codes-8 have std
                # ~4.6; d sets w_eff std to 0.5/sqrt(in)
                q = jax.random.randint(kq, (L_, inn // 2, out), 0, 256,
                                       jnp.int32).astype(jnp.uint8)
                d = jnp.full((L_, inn // 32, out),
                             0.5 / math.sqrt(inn) / 4.6, jnp.bfloat16)
                kind = "q4fast" if quantize == "int4" else "q4bc"
                layers[k] = Linear(q=q, d=d, m=None, kind=kind, fmt="INT4")
            elif quantize == "int5":
                # uniform nibble + bit planes; unpacked codes-16 have std
                # ~9.2; d sets w_eff std to 0.5/sqrt(in)
                q = jax.random.randint(kq, (L_, inn // 2, out), 0, 256,
                                       jnp.int32).astype(jnp.uint8)
                qh = jax.random.randint(jax.random.fold_in(kq, 1),
                                        (L_, inn // 8, out), 0, 256,
                                        jnp.int32).astype(jnp.uint8)
                d = jnp.full((L_, inn // 32, out),
                             0.5 / math.sqrt(inn) / 9.2, jnp.bfloat16)
                layers[k] = Linear(q=q, qh=qh, d=d, m=None, kind="q5fast",
                                   fmt="INT5")
            elif quantize.startswith("w5a8bc"):
                # 5-bit bitcast class: row-pair nibble plane + row-quad i2
                # sign plane (kind bc5a8); uniform random planes give
                # n + 8*sigma std ~10.1 (sigma spans all four i2 values
                # here — only perf-relevant, real packs use {-1,+1})
                g = int(quantize[6:]) if len(quantize) > 6 else 128
                q = jax.random.randint(kq, (L_, inn // 2, out), 0, 256,
                                       jnp.int32).astype(jnp.uint8)
                qh = jax.random.randint(jax.random.fold_in(kq, 1),
                                        (L_, inn // 4, out), 0, 256,
                                        jnp.int32).astype(jnp.uint8)
                d = jnp.full((L_, inn // g, out),
                             0.5 / math.sqrt(inn) / 10.1, jnp.bfloat16)
                layers[k] = Linear(q=q, qh=qh, d=d, m=None, kind="bc5a8",
                                   fmt=f"INT5G{g}")
            elif quantize.startswith("w4a8"):
                # uniform packed nibbles (same bytes as int4; unpacked
                # codes-8 std ~4.6); grouped-integer-dot kinds: w4a8gN =
                # half-split layout with coarse N-groups; w4a8bc[256] =
                # row-pair bitcast layout (kind bc4a8), group 128/256
                if quantize.startswith("w4a8bc"):
                    g = int(quantize[6:]) if len(quantize) > 6 else 128
                    kind = "bc4a8"
                else:
                    g = int(quantize[5:]) if len(quantize) > 4 else 32
                    kind = "w4a8g"
                fmt = "INT4" if g == 32 else f"INT4G{g}"
                q = jax.random.randint(kq, (L_, inn // 2, out), 0, 256,
                                       jnp.int32).astype(jnp.uint8)
                d = jnp.full((L_, inn // g, out),
                             0.5 / math.sqrt(inn) / 4.6, jnp.bfloat16)
                layers[k] = Linear(q=q, d=d, m=None, kind=kind, fmt=fmt)
            else:
                q = jax.random.randint(kq, (L_, inn, out), -127, 128, jnp.int8)
                # uniform int8 codes have std ~73; d sets w_eff std to 0.5/sqrt(in)
                d = jnp.full((L_, inn // 32, out), 0.5 / math.sqrt(inn) / 73.0,
                             jnp.bfloat16)
                layers[k] = Linear(q=q, d=d, m=None, kind="qfast", fmt="Q8_0")
        host = dict(host)
        host["layers"] = layers

    leaves, treedef = jax.tree.flatten(host)

    synth_idx = [
        i for i, leaf in enumerate(leaves)
        if isinstance(leaf, np.ndarray)
        and leaf.flags["OWNDATA"] is False and leaf.size >= (1 << 16)
    ]
    want_bf16 = np.dtype(dtype) == np.dtype("bfloat16")

    # one jit builds every big leaf on device (per-leaf dispatch costs one
    # XLA compile each over the remote-compile tunnel)
    @jax.jit
    def build(key):
        ks = jax.random.split(key, len(synth_idx))
        outs = []
        for k, i in zip(ks, synth_idx):
            leaf = leaves[i]
            scale = 0.5 / np.sqrt(leaf.shape[-2] if leaf.ndim > 1 else leaf.shape[-1])
            arr = jax.random.normal(k, leaf.shape, jnp.float32) * scale
            outs.append(arr.astype(jnp.bfloat16) if want_bf16 and leaf.ndim > 1 else arr)
        return outs

    built = build(jax.random.PRNGKey(seed))
    out = list(leaves)
    for i, arr in zip(synth_idx, built):
        out[i] = arr
    # small host-built leaves with meaningful values transfer as-is
    out = [jnp.asarray(x) if isinstance(x, np.ndarray) else x for x in out]
    return jax.tree.unflatten(treedef, out)


def random_params(cfg: ModelConfig, dtype=np.float32, seed: int = 0, shapes_only: bool = False):
    """Random params scaled so activations stay sane (decode won't overflow)."""
    rng = np.random.default_rng(seed)
    E, V, L, H, S = cfg.n_embed, cfg.n_vocab, cfg.n_layer, cfg.head_count, cfg.head_size

    def mat(*shape, scale=None):
        if shapes_only:
            # zero-fill via broadcast view (OWNDATA=False marks it synthetic
            # for random_params_device, and no RNG time is spent)
            return np.broadcast_to(np.zeros(1, dtype), shape)
        scale = scale if scale is not None else 0.5 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (rng.standard_normal(shape) * scale).astype(dtype)

    def vec(*shape, val=None):
        if val is not None:
            return np.full(shape, val, np.float32)
        return rng.uniform(0.0, 1.0, shape).astype(np.float32)

    def stk(arrs):
        if shapes_only:
            return np.broadcast_to(np.zeros(1, arrs[0].dtype), (len(arrs),) + arrs[0].shape)
        return np.stack(arrs)

    def lin(inn, out):
        return Linear(w=stk([mat(inn, out) for _ in range(L)]), kind="dense")

    emb = mat(V, E, scale=0.02)
    params = {
        "emb": emb if shapes_only else emb.astype(np.float32),
        "ln0_w": vec(E, val=1.0), "ln0_b": vec(E, val=0.0),
        "ln_out_w": vec(E, val=1.0), "ln_out_b": vec(E, val=0.0),
        "head": Linear(w=mat(E, V, scale=0.02), kind="dense"),
    }
    F = 4 * E if cfg.version_major != 6 else int(3.5 * E)
    lay = {
        "ln1_w": np.ones((L, E), np.float32), "ln1_b": np.zeros((L, E), np.float32),
        "ln2_w": np.ones((L, E), np.float32), "ln2_b": np.zeros((L, E), np.float32),
        "att_k": lin(E, E), "att_v": lin(E, E), "att_r": lin(E, E), "att_o": lin(E, E),
        "ffn_k": lin(E, F), "ffn_v": lin(F, E),
    }
    if cfg.version_major == 4:
        lay.update(
            att_mix_k=vec(L, E), att_mix_v=vec(L, E), att_mix_r=vec(L, E),
            time_first=vec(L, E) * 0.3,
            time_decay=-np.exp(rng.uniform(-3, 1, (L, E))).astype(np.float32),
            ffn_mix_k=vec(L, E), ffn_mix_r=vec(L, E), ffn_r=lin(E, E),
        )
    elif cfg.version_major == 5:
        lay.update(
            att_mix_k=vec(L, E), att_mix_v=vec(L, E), att_mix_r=vec(L, E),
            time_decay=np.exp(-np.exp(rng.uniform(-3, 1, (L, H, S)))).astype(np.float32),
            time_first=vec(L, H, S) * 0.3,
            ln_x_w=np.ones((L, E), np.float32), ln_x_b=np.zeros((L, E), np.float32),
            ffn_mix_k=vec(L, E), ffn_mix_r=vec(L, E), ffn_r=lin(E, E),
        )
        if cfg.version_minor >= 2:
            lay.update(att_mix_g=vec(L, E), att_gate=lin(E, E))
    elif cfg.version_major == 6:
        K = 32
        D = 64
        lay.update(
            maa_x=vec(L, E), maa_w=vec(L, E), maa_k=vec(L, E),
            maa_v=vec(L, E), maa_r=vec(L, E), maa_g=vec(L, E),
            tm_w1=lin(E, 5 * K),
            tm_w2=stk([stk([mat(K, E) for _ in range(5)]) for _ in range(L)]),
            decay_base=rng.uniform(-3, 1, (L, E)).astype(np.float32),
            decay_w1=lin(E, D), decay_w2=lin(D, E),
            time_first=vec(L, H, S) * 0.3,
            att_gate=lin(E, E),
            ln_x_w=np.ones((L, E), np.float32), ln_x_b=np.zeros((L, E), np.float32),
            ffn_maa_k=vec(L, E), ffn_maa_r=vec(L, E), ffn_r=lin(E, E),
        )
    elif cfg.version_major == 7:
        D = max(32, E // 16)
        lay.update(
            x_rwkvag=vec(L, 6, E),
            w0=rng.uniform(-2, 0, (L, E)).astype(np.float32),
            a0=np.zeros((L, E), np.float32),
            v0=np.zeros((L, E), np.float32),
            k_k=vec(L, E), k_a=vec(L, E),
            r_k=(rng.standard_normal((L, H, S)) * 0.1).astype(np.float32),
            w1=lin(E, D), w2=lin(D, E), a1=lin(E, D), a2=lin(D, E),
            g1=lin(E, D), g2=lin(D, E), v1=lin(E, D), v2=lin(D, E),
            ln_x_w=np.ones((L, E), np.float32), ln_x_b=np.zeros((L, E), np.float32),
            ffn_x_k=vec(L, E),
        )
    params["layers"] = lay
    return params
