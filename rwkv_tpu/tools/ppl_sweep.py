"""One-command BASELINE parity sweep: perplexity / latency / size per format.

Given a real checkpoint (a converted `.bin`, or a PyTorch `.pth` which is
converted first), quantizes it to every requested format, measures perplexity
(exp of mean next-token cross-entropy — the reference harness's definition,
python/measure_pexplexity.py:69-109), per-token latency, and file size, and
prints the table in BASELINE.md's layout so the deltas line up with the
reference's published numbers (README.md:25-31: Q4_0 ppl delta vs FP16 must
be ~+1.884 on RWKV-4 Pile 169M, Q5_1 ~+0.228, Q8_0 ~+0.029).

Usage:
    python -m rwkv_tpu.tools.ppl_sweep MODEL.{bin,pth} TEXT.txt \
        [--formats Q4_0,Q4_1,Q5_0,Q5_1,Q8_0,FP16,FP32] \
        [--ignore-first-n 50] [--token-limit N] [--tokenizer auto] \
        [--workdir DIR]

Lowercase entries in --formats are SERVING modes (int8, int4, int5, w8a8,
w4a8): the model is quantized on device at load time (Context(quantize=...))
instead of writing a file, and the size column reports the in-HBM weight
footprint — use these to compare the packed serving kernels' quality against
the file formats they correspond to.

No network access is needed — everything runs locally against the checkpoint
you provide.
"""

from __future__ import annotations

import argparse
import os
import tempfile

DEFAULT_FORMATS = ("Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "FP16", "FP32")


# on-device serving quantization modes (Context(quantize=...)) — lowercase to
# distinguish from file formats; "size" is the in-HBM weight footprint
SERVING_MODES = ("int8", "int4", "int4bc", "int5", "w8a8", "w4a8",
                 "w4a8g64", "w4a8g128", "w4a8g256", "w4a8bc", "w4a8bc256",
                 "w5a8bc", "w5a8bc256")


def _params_gb(params) -> float:
    import jax

    bits = 0
    for x in jax.tree.leaves(params):
        if hasattr(x, "size") and hasattr(x, "dtype"):
            bits += x.size * (4 if x.dtype.name == "int4" else 8 * x.dtype.itemsize)
    return bits / 8 / 1e9


def sweep(model_path: str, tokens, formats=DEFAULT_FORMATS,
          ignore_first_n: int = 0, workdir: str | None = None, chunk_size: int = 256):
    """Returns a list of row dicts: format, perplexity, ms_per_token, size_gb.
    `model_path` must be a .bin (converted) FP32 or FP16 model. Entries in
    `formats` may also be serving modes (SERVING_MODES, lowercase): those
    quantize on device at load time instead of writing a file, and size_gb
    is the in-HBM weight footprint rather than a file size."""
    from rwkv_tpu.formats.quantize import quantize_model_file
    from rwkv_tpu.formats import container, convert as conv
    from rwkv_tpu.runtime.context import Context
    from rwkv_tpu.utils.perplexity import measure_perplexity

    tmp = workdir or tempfile.mkdtemp(prefix="rwkv_sweep_")
    os.makedirs(tmp, exist_ok=True)
    src_header = container.read_model_header(model_path)
    src_fmt = src_header.data_type_name

    rows = []
    for fmt in formats:
        if fmt in SERVING_MODES:
            ctx = Context(model_path, quantize=fmt)
            size_gb = _params_gb(ctx._params)
        else:
            if fmt == src_fmt:
                path = model_path
            elif fmt in ("FP16", "FP32"):
                # re-encode via the converter's record writer (dtype change only)
                path = os.path.join(tmp, f"model-{fmt}.bin")
                if not os.path.exists(path):
                    conv.rewrite_precision(model_path, path, fmt)
            else:
                path = os.path.join(tmp, f"model-{fmt}.bin")
                if not os.path.exists(path):
                    quantize_model_file(model_path, path, fmt)
            ctx = Context(path)
            size_gb = os.path.getsize(path) / 1e9
        r = measure_perplexity(ctx, tokens, ignore_first_n, chunk_size=chunk_size)
        rows.append(dict(
            format=fmt,
            perplexity=r.perplexity,
            ms_per_token=r.ms_per_token,
            size_gb=size_gb,
        ))
        del ctx
    return rows


def format_table(rows) -> str:
    ref = {r["format"]: r for r in rows}
    base = ref.get("FP16") or ref.get("FP32") or rows[-1]
    lines = [
        "| Format | Perplexity | delta vs FP16 | Latency ms/token | File size GB |",
        "|--------|------------|---------------|------------------|--------------|",
    ]
    for r in rows:
        d = r["perplexity"] - base["perplexity"]
        lines.append(
            f"| {r['format']:<6} | {r['perplexity']:10.3f} | {d:+13.3f} | "
            f"{r['ms_per_token']:16.2f} | {r['size_gb']:12.3f} |"
        )
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("model_path", help=".bin model (or .pth — converted first)")
    p.add_argument("text_path")
    p.add_argument("--formats", default=",".join(DEFAULT_FORMATS))
    p.add_argument("--ignore-first-n", type=int, default=50)
    p.add_argument("--token-limit", type=int, default=-1)
    p.add_argument("--tokenizer", default="auto")
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    model_path = args.model_path
    if model_path.endswith(".pth"):
        from rwkv_tpu.formats.convert import convert_pth

        out = os.path.join(args.workdir or tempfile.mkdtemp(prefix="rwkv_sweep_"),
                           "model-FP32.bin")
        print(f"Converting {model_path} -> {out}")
        convert_pth(model_path, out, "FP32")
        model_path = out

    from rwkv_tpu.runtime.context import Context
    from rwkv_tpu.utils.tokenizer import get_tokenizer

    ctx = Context(model_path)
    text = open(args.text_path, encoding="utf-8").read()
    _, encode = get_tokenizer(args.tokenizer, ctx.n_vocab)
    tokens = encode(text)
    if args.token_limit > 0:
        tokens = tokens[: args.token_limit]
    print(f"{len(tokens)} tokens; ignoring first {args.ignore_first_n}")
    del ctx

    rows = sweep(model_path, tokens, tuple(args.formats.split(",")),
                 args.ignore_first_n, args.workdir)
    print(format_table(rows))


if __name__ == "__main__":
    main()
