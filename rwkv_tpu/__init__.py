"""rwkv_tpu — a TPU-native (JAX/XLA/Pallas) inference framework for RWKV v4/v5/v6/v7.

Built from scratch against the behavioral spec of RWKV/rwkv.cpp (see SURVEY.md):
same model file format, same quantization formats (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0),
same externalized-recurrent-state API surface — but designed TPU-first:

- compute path: jnp + Pallas kernels (fused dequant-matmul, WKV scan kernels)
- execution: jax.jit with padded sequence-length buckets (replaces ggml's
  graph-cache-per-length, reference rwkv_eval.inc:112-120)
- scale-out: jax.sharding.Mesh + NamedSharding (TP over heads, DP over batch)
  instead of the reference's single-process design (SURVEY.md §2.4).

Public API parity map (reference rwkv.h:76-221):
  rwkv_init_from_file        -> rwkv_tpu.RWKVModel(path)  /  runtime.Context
  rwkv_clone_context         -> Context.clone()
  rwkv_eval                  -> Context.eval(token, state)
  rwkv_eval_sequence         -> Context.eval_sequence(tokens, state)
  rwkv_eval_sequence_in_chunks -> Context.eval_sequence_in_chunks(...)
  rwkv_init_state            -> Context.init_state()
  rwkv_get_n_vocab/...       -> Context.n_vocab / n_embed / n_layer / state_len / logits_len
  rwkv_quantize_model_file   -> formats.quantize.quantize_model_file
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy so `rwkv_tpu.formats` is importable without pulling in jax.
    if name in ("Context", "init_from_file"):
        from rwkv_tpu.runtime import context

        return getattr(context, name)
    raise AttributeError(name)
