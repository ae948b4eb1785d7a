"""Real multi-process distributed execution (the DCN-axis story, SURVEY §5.8).

The reference is strictly single-process (no MPI/NCCL/Gloo anywhere —
SURVEY.md §2.4); the TPU-native design replaces that with one global mesh
whose outer ('dp') axis crosses HOSTS. A virtual-device dryrun can't prove
that path: `jax.distributed.initialize` + cross-process collectives are a
different runtime. This module runs the real thing on CPU (gloo collectives,
the same code path a multi-host TPU pod uses over DCN for host-level data
parallelism):

  - `run_multiprocess_dryrun(num_processes, local_devices)` (parent):
    computes a single-process reference (prefill logits + greedy decode
    tokens) on a local CPU mesh, then spawns N worker processes that
    initialize `jax.distributed`, build a global (dp=N, tp=local) mesh whose
    dp axis SPANS processes, run the same sharded prefill + decode, and
    assert equality. Exit code 0 from every worker = pass.

  - worker mode (``python -m rwkv_tpu.parallel.multiproc <pid> <nproc> ...``).

Worker-side collectives: gloo (jax_cpu_collectives_implementation); on TPU
pods the same `jax.distributed.initialize` + mesh code runs over ICI/DCN
with XLA's native collectives — only the transport differs.
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile


MODEL_KW = dict(version="7.0", n_vocab=256, n_embed=256, n_layer=2)  # H=4: shards over tp=4
B, T, DECODE_STEPS = 4, 24, 6


def _build_case():
    """Deterministic tiny model + inputs (identical in parent and workers:
    synth params are host-numpy seeded)."""
    import jax.numpy as jnp
    import numpy as np

    from rwkv_tpu.models import synth

    cfg = synth.make_config(**MODEL_KW)
    params = synth.random_params(cfg, seed=7)
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, size=(B, T)), jnp.int32)
    lengths = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    return cfg, params, tokens, lengths


def _reference(tmp_path: str):
    """Single-process reference results -> pickle (run in the parent)."""
    import jax
    import numpy as np

    from rwkv_tpu.models import forward as fwd
    from rwkv_tpu.runtime import generate as G

    cfg, params, tokens, lengths = _build_case()
    state = G.batched_init_state(cfg, B)
    logits, _ = fwd.forward_seq(params, cfg, tokens, state, lengths)
    toks, _ = G.greedy_decode(params, cfg, tokens[:, 0], state, steps=DECODE_STEPS)
    with open(tmp_path, "wb") as f:
        pickle.dump({"logits": np.asarray(logits), "toks": np.asarray(toks)}, f)


def _worker(process_id: int, num_processes: int, local_devices: int,
            port: int, ref_path: str):
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    from jax.sharding import Mesh

    from rwkv_tpu.models import forward as fwd
    from rwkv_tpu.parallel import shard as SH
    from rwkv_tpu.runtime import generate as G

    n_global = jax.device_count()
    assert n_global == num_processes * local_devices, (
        n_global, num_processes, local_devices)
    # dp axis ACROSS processes (device order is process-major), tp within
    arr = np.asarray(jax.devices()).reshape(num_processes, local_devices)
    mesh = Mesh(arr, axis_names=("dp", "tp"))

    cfg, params, tokens, lengths = _build_case()
    params = SH.shard_params(mesh, cfg, params)
    state = SH.shard_state(mesh, cfg, G.batched_init_state(cfg, B))
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    tokens = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    lengths = jax.device_put(lengths, NamedSharding(mesh, P("dp")))

    logits, _ = fwd.forward_seq(params, cfg, tokens, state, lengths)
    toks, _ = G.greedy_decode(params, cfg, tokens[:, 0], state,
                              steps=DECODE_STEPS)

    from jax.experimental import multihost_utils

    logits_np = multihost_utils.process_allgather(logits, tiled=True)
    toks_np = multihost_utils.process_allgather(toks, tiled=True)
    with open(ref_path, "rb") as f:
        ref = pickle.load(f)
    np.testing.assert_allclose(logits_np, ref["logits"], atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(toks_np, ref["toks"])
    if process_id == 0:
        print(f"multiproc dryrun OK: {num_processes} processes x "
              f"{local_devices} devices, mesh {dict(mesh.shape)}, "
              f"dp spans processes (gloo collectives); prefill logits and "
              f"{DECODE_STEPS}-step greedy decode match single-process",
              flush=True)
    jax.distributed.shutdown()


def run_multiprocess_dryrun(num_processes: int = 2, local_devices: int = 4,
                            port: int = 52931, timeout: int = 600) -> None:
    """Parent entry: reference + spawn workers + assert success."""
    with tempfile.TemporaryDirectory() as td:
        ref_path = os.path.join(td, "ref.pkl")
        _reference(ref_path)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # drop the axon sitecustomize bootstrap: workers are CPU-only, and
        # the TPU-relay registration it runs at interpreter startup can stall
        # indefinitely when the relay is busy/down
        env["PYTHONPATH"] = ""
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", "")
            + f" --xla_force_host_platform_device_count={local_devices}"
        )
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "rwkv_tpu.parallel.multiproc",
                 str(i), str(num_processes), str(local_devices), str(port),
                 ref_path],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, cwd=os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))),
            )
            for i in range(num_processes)
        ]
        outs = []
        ok = True
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                ok = False
            outs.append(out)
            ok = ok and p.returncode == 0
        if not ok:
            raise RuntimeError(
                "multi-process dryrun failed:\n" + "\n---\n".join(outs))
        marker = [ln for ln in outs[0].splitlines()
                  if "multiproc dryrun OK" in ln]
        print(marker[0] if marker else outs[0])


if __name__ == "__main__":
    # worker entry — MUST configure platform before jax initializes devices
    _pid, _n, _local, _port, _ref = sys.argv[1:6]
    import jax

    jax.config.update("jax_platforms", "cpu")
    _worker(int(_pid), int(_n), int(_local), int(_port), _ref)
