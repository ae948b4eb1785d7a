"""Tooling tests: tokenizers, sampling, converter, LoRA merge, perplexity.

Mirrors the reference's python unit tests (convert_pytorch_to_ggml.test.py,
rwkv_world_tokenizer.test.py) plus end-to-end convert->load and LoRA-merge
checks the reference only exercises manually.
"""

import os
import struct

import numpy as np
import pytest

from rwkv_tpu.formats import container
from rwkv_tpu.formats.convert import convert_state_dict
from rwkv_tpu.formats.lora import merge_lora
from rwkv_tpu.utils.sampling import sample_logits, sample_probs
from rwkv_tpu.utils.tokenizer import get_tokenizer, get_world_tokenizer
from tests.common import fixture


def test_world_tokenizer_reference_string():
    """Reference oracle: rwkv_world_tokenizer.test.py:7-17."""
    decode, encode = get_world_tokenizer()
    s = "I'll 'd test блабла 以下は、]) -> <|endoftext|><|padding|> int"
    expected = [74, 5229, 274, 101, 32223, 5092, 27980, 2795, 27980, 33, 10399,
                10258, 10139, 10079, 1682, 3463, 295, 125, 25258, 7588, 2318,
                125, 790, 125, 49520, 125, 63, 21888]
    actual = encode(s)
    assert actual == expected
    assert decode(actual) == s


def test_world_tokenizer_partial_utf8_deferral():
    decode, encode = get_world_tokenizer()
    toks = encode("日本語")
    # decoding a strict prefix of a multibyte char must yield U+FFFD, not raise
    from rwkv_tpu.utils.tokenizer import WorldTokenizer

    t = WorldTokenizer()
    partial = t.decode_bytes(toks)[:-1]
    assert "�" in partial.decode("utf-8", errors="replace")


def test_tokenizer_auto_dispatch():
    with pytest.raises(ValueError):
        get_tokenizer("auto", 1234)
    d, e = get_tokenizer("auto", 65536)
    assert e("hello")  # world
    d20, e20 = get_tokenizer("auto", 50277)
    ids = e20("Hello world")
    assert d20(ids).strip() == "Hello world"


def test_sampling_semantics():
    logits = np.array([0.0, 5.0, 1.0, -2.0], dtype=np.float32)
    assert sample_logits(logits, temperature=0.0) == 1  # argmax
    rng = np.random.default_rng(0)
    # top_p small -> nucleus collapses to argmax
    for _ in range(5):
        assert sample_logits(logits, temperature=1.0, top_p=0.01, rng=rng) == 1
    # logit bias can force a token
    assert sample_logits(logits, 0.0, 1.0, logit_bias={3: 100.0}) == 3
    # top_p=0 treated as disabled (reference sampling.py:24-25)
    probs = np.full(4, 0.25, np.float32)
    counts = {sample_probs(probs, 1.0, 0.0, rng=rng) for _ in range(64)}
    assert len(counts) > 1
    with pytest.raises(ValueError):
        sample_probs(probs, 1.0, 1.5)


def test_converter_byte_layout(tmp_path):
    """Reference golden byte layout: convert_pytorch_to_ggml.test.py:21-46."""
    sd = {
        "emb.weight": np.array([[1, 2], [3, 4], [5, 6]], dtype=np.float32),
        "blocks.0.ln1.weight": np.array([1], dtype=np.float32),
    }
    path = tmp_path / "out.bin"
    convert_state_dict(sd, str(path), "FP32")
    actual = path.read_bytes()
    expected = struct.pack(
        "=iiiiii" + "iiiii10sffffff" + "iiii19sf",
        0x67676D66, 101, 3, 2, 1, 0,
        2, 10, 0, 2, 3, b"emb.weight", 1.0, 2.0, 3.0, 4.0, 5.0, 6.0,
        1, 19, 0, 1, b"blocks.0.ln1.weight", 1.0,
    )
    assert list(actual) == list(expected)


def test_converter_roundtrip_v7(tmp_path):
    """Synthesize a v7 pytorch-style state dict, convert, reload, eval."""
    from tests.common import make_v7_state_dict

    E = 64
    sd = make_v7_state_dict(E=E, V=256, L=2, D=32)
    path = tmp_path / "v7.bin"
    convert_state_dict(sd, str(path), "FP16")
    # x_rwkvag must have been concatenated
    _, tensors = container.read_model_file(str(path))
    assert "blocks.0.att.x_rwkvag" in tensors
    assert tensors["blocks.0.att.x_rwkvag"].numpy_shape == (6, 1, E)
    assert "blocks.0.att.x_r" not in tensors

    from rwkv_tpu.runtime.context import Context

    ctx = Context(str(path))
    assert ctx.cfg.version_major == 7
    logits, _ = ctx.eval_sequence([1, 2, 3])
    assert np.isfinite(np.asarray(logits)).all()


def test_lora_merge(tmp_path):
    """Merge a rank-2 LoRA into the tiny 5v2 model; logits must change but
    stay finite; unrelated params byte-identical."""
    src = fixture("tiny-rwkv-5v2-730K-FP32.bin")
    rng = np.random.default_rng(0)
    E = 64
    lora = {
        "blocks.0.att.key.lora_A.weight": rng.standard_normal((2, E)).astype(np.float32) * 0.1,
        "blocks.0.att.key.lora_B.weight": rng.standard_normal((E, 2)).astype(np.float32) * 0.1,
    }
    dest = tmp_path / "merged.bin"
    merge_lora(src, "v5.2", dict(lora), 4, str(dest))

    _, t_src = container.read_model_file(src)
    _, t_dst = container.read_model_file(str(dest))
    assert t_src["blocks.0.att.value.weight"].data == t_dst["blocks.0.att.value.weight"].data
    assert t_src["blocks.0.att.key.weight"].data != t_dst["blocks.0.att.key.weight"].data
    expected = t_src["blocks.0.att.key.weight"].to_float32() + (
        lora["blocks.0.att.key.lora_B.weight"] @ lora["blocks.0.att.key.lora_A.weight"]
    ) * (4 / 2)
    np.testing.assert_allclose(t_dst["blocks.0.att.key.weight"].to_float32(), expected, rtol=1e-6)

    from rwkv_tpu.runtime.context import Context

    ctx = Context(str(dest))
    logits, _ = ctx.eval_sequence([34, 105, 110])
    assert np.isfinite(np.asarray(logits)).all()


def test_perplexity_harness():
    """exp(mean CE) on the tiny model; chunked all-logits path must agree with
    the serial definition (reference measure_pexplexity.py:69-109)."""
    from rwkv_tpu.runtime.context import Context
    from rwkv_tpu.utils.perplexity import measure_perplexity

    ctx = Context(fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    text = b"This is a port of BlinkDL/RWKV-LM to ggerganov/ggml. " * 3
    tokens = list(text)
    r = measure_perplexity(ctx, tokens, ignore_first_n_tokens=2, chunk_size=32)
    assert np.isfinite(r.perplexity)

    # serial-definition reference value
    import jax.nn

    state = None
    losses = []
    for i in range(len(tokens) - 1):
        logits, state = ctx.eval(tokens[i], state)
        if i + 1 >= 2:
            logp = np.asarray(jax.nn.log_softmax(np.asarray(logits)))
            losses.append(-logp[tokens[i + 1]])
    expected = float(np.exp(np.mean(losses)))
    assert abs(r.perplexity - expected) / expected < 1e-3


def test_quantization_perplexity_deltas(tmp_path):
    """BASELINE.md's headline table is perplexity-vs-bit-width on RWKV-4 Pile
    169M (unfetchable here); the measurable analogue: on the trained tiny
    model, quantized perplexity must stay close to FP32 and degrade
    monotonically with coarser formats."""
    from rwkv_tpu.formats.quantize import quantize_model_file
    from rwkv_tpu.runtime.context import Context
    from rwkv_tpu.utils.perplexity import measure_perplexity

    src = fixture("tiny-rwkv-5v2-730K-FP32.bin")
    text = (
        b"in the beginning the structure of the system was simple, and the "
        b"people who used it understood the structure of the system well."
    )
    tokens = list(text)

    def ppl(path):
        return measure_perplexity(Context(path), tokens, ignore_first_n_tokens=8).perplexity

    base = ppl(src)
    results = {}
    for fmt in ("Q8_0", "Q5_1", "Q4_0"):
        out = str(tmp_path / f"{fmt}.bin")
        quantize_model_file(src, out, fmt)
        results[fmt] = ppl(out)

    # deltas vs FP32 are small and ordered by bit width (same shape as the
    # reference's published table, README.md:25-31). Bounds are ~2-2.5x the
    # measured deltas on this model (Q8_0 +0.18%, Q5_1 +0.75%, Q4_0 +7.9%)
    # so real codec regressions trip them while reduction-order noise doesn't.
    assert abs(results["Q8_0"] - base) < 0.02 * base, (base, results)
    assert abs(results["Q5_1"] - base) < 0.05 * base, (base, results)
    assert abs(results["Q4_0"] - base) < 0.20 * base, (base, results)
    assert results["Q4_0"] >= results["Q8_0"] - 0.01 * base, results
    assert results["Q5_1"] >= results["Q8_0"] - 0.01 * base, results


def test_serving_mode_perplexity_deltas():
    """The packed on-device serving modes (VERDICT r2 #1's quality criterion)
    must hold perplexity within the band of the file format they correspond
    to: int4/w4a8 in the Q4-class band, int5 in the Q5-class band, int8/w8a8
    near-lossless — measured through ppl_sweep's serving-mode path."""
    from rwkv_tpu.tools.ppl_sweep import sweep

    src = fixture("tiny-rwkv-5v2-730K-FP32.bin")
    text = (
        b"in the beginning the structure of the system was simple, and the "
        b"people who used it understood the structure of the system well."
    )
    tokens = list(text)
    rows = {r["format"]: r for r in sweep(
        src, tokens, formats=("FP32", "int8", "w8a8", "int5", "int4", "w4a8",
                              "w4a8bc"),
        ignore_first_n=8)}
    base = rows["FP32"]["perplexity"]

    # same band shape as test_quantization_perplexity_deltas' file formats
    # (bounds ~2-2.5x measured deltas); w4a8 adds a8 activation rounding on
    # top of int4's weight error
    assert abs(rows["int8"]["perplexity"] - base) < 0.02 * base, rows
    assert abs(rows["w8a8"]["perplexity"] - base) < 0.03 * base, rows
    assert abs(rows["int5"]["perplexity"] - base) < 0.05 * base, rows
    assert abs(rows["int4"]["perplexity"] - base) < 0.20 * base, rows
    assert abs(rows["w4a8"]["perplexity"] - base) < 0.25 * base, rows
    # bitcast + grouped-int decode path (bc4a8, INT4G128): same 4-bit band
    # (measured +3.3% on this model vs int4's +8.3%)
    assert abs(rows["w4a8bc"]["perplexity"] - base) < 0.25 * base, rows
    # packed modes really shrink the footprint (int4 < int5 < int8 < dense)
    assert rows["int4"]["size_gb"] < rows["int5"]["size_gb"] < rows["int8"]["size_gb"]
    assert rows["int8"]["size_gb"] < rows["FP32"]["size_gb"]


def test_generate_completions_cli():
    """App-level smoke test (reference python/generate_completions.py):
    drive the CLI end-to-end as a subprocess on the tiny model."""
    import subprocess
    import sys

    path = fixture("tiny-rwkv-5v2-730K-FP32.bin")
    # PYTHONPATH="" drops the axon sitecustomize bootstrap: the subprocess is
    # CPU-only, and the TPU-relay registration it would otherwise run at
    # interpreter startup can stall indefinitely when the relay is busy or
    # down (observed: a relay outage turned this test into a 900 s timeout)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    r = subprocess.run(
        [sys.executable, "-m", "rwkv_tpu.tools.generate_completions", path,
         "--prompt", '"in the beginning', "--count", "1", "--tokens", "8",
         "--temperature", "0.0"],
        # generous budget: the subprocess cold-starts jax (~30-60 s) and the
        # suite may be sharing the machine with a TPU bench — 300 s flaked
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tok/s" in r.stdout or "Took" in r.stdout or len(r.stdout) > 0


def test_ppl_sweep_tool(tmp_path):
    """tools/ppl_sweep: one command produces the BASELINE.md-format table
    (ppl / delta-vs-FP16 / latency / size per format) from a checkpoint."""
    from rwkv_tpu.tools.ppl_sweep import sweep, format_table

    src = fixture("tiny-rwkv-5v2-730K-FP32.bin")
    tokens = list(
        b"in the beginning the structure of the system was simple, and the "
        b"people who used it understood the structure of the system well."
    )
    rows = sweep(src, tokens, formats=("Q5_1", "Q8_0", "FP16", "FP32"),
                 ignore_first_n=8, workdir=str(tmp_path))
    by_fmt = {r["format"]: r for r in rows}
    # ordering: coarser formats can't beat FP32 by much; FP16 ~ FP32
    assert abs(by_fmt["FP16"]["perplexity"] - by_fmt["FP32"]["perplexity"]) \
        < 0.01 * by_fmt["FP32"]["perplexity"]
    assert by_fmt["Q5_1"]["perplexity"] >= by_fmt["FP32"]["perplexity"] * 0.99
    assert by_fmt["Q5_1"]["size_gb"] < by_fmt["FP16"]["size_gb"] < by_fmt["FP32"]["size_gb"]
    table = format_table(rows)
    assert "delta vs FP16" in table and "Q8_0" in table
    # deltas computed against the FP16 row (BASELINE.md's anchor)
    assert f"{by_fmt['Q8_0']['perplexity'] - by_fmt['FP16']['perplexity']:+.3f}" in table


def test_chat_save_load_session(tmp_path, monkeypatch, capsys):
    """+save/+load chat commands: a whole conversation persists as one .npz
    (tokens + logits + the byte-compatible O(1) state buffer)."""
    import json
    import sys as _sys

    from rwkv_tpu.tools import chat as C

    pj = tmp_path / "p.json"
    pj.write_text(json.dumps({"user": "B", "assistant": "A", "separator": ":",
                              "prompt": '"in the beginning'}))
    sess = str(tmp_path / "sess")
    inputs = iter([f"+save {sess}", "+reset", f"+load {sess}"])

    def fake_input(prompt=""):
        try:
            return next(inputs)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    monkeypatch.setattr(_sys, "argv", [
        "chat", fixture("tiny-rwkv-5v2-730K-FP32.bin"),
        "--prompt-json", str(pj)])
    C.main()
    out = capsys.readouterr().out
    assert "Session saved" in out and "Session loaded" in out
    assert "17 tokens of context" in out  # full pre-save context restored
    assert (tmp_path / "sess.npz").exists()
