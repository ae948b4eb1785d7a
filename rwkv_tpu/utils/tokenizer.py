"""Tokenizers: RWKV World (byte-level greedy longest-match) + 20B (HF tokenizers).

Behavior contract from the reference (rwkv_world_tokenizer.py, tokenizer_util.py):
  - World vocab v20230424 (65536 entries); encoding is greedy longest-match
    over raw UTF-8 bytes; decode defers malformed sequences via U+FFFD so
    streaming callers can wait for more tokens.
  - 'auto' dispatch by n_vocab: 50277 -> 20B (HF tokenizers + 20B_tokenizer.json),
    65536 -> world.

The vocab files are the public RWKV assets, vendored gzipped under
rwkv_tpu/assets/. The trie here is a flat dict keyed by byte-prefix hash —
simpler and faster in CPython than a node-object trie.
"""

from __future__ import annotations

import ast
import gzip
import os
from typing import Callable, List, Tuple

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


class WorldTokenizer:
    """Byte-level greedy longest-match tokenizer over the World vocab."""

    def __init__(self, vocab_path: str | None = None):
        if vocab_path is None:
            vocab_path = os.path.join(_ASSET_DIR, "rwkv_vocab_v20230424.txt.gz")
        opener = gzip.open if vocab_path.endswith(".gz") else open
        self.index_to_token: dict[int, bytes] = {}
        with opener(vocab_path, "rt", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                sp0 = line.index(" ")
                sp1 = line.rindex(" ")
                idx = int(line[:sp0])
                tok = ast.literal_eval(line[sp0:sp1].strip())
                tok = tok.encode("utf-8") if isinstance(tok, str) else tok
                assert isinstance(tok, bytes) and len(tok) == int(line[sp1:])
                self.index_to_token[idx] = tok

        self.token_to_index = {t: i for i, t in self.index_to_token.items()}
        # prefix set + exact-match dict: at each position we extend the match
        # while the byte prefix is still a prefix of some vocab entry
        self._max_len = max(len(t) for t in self.token_to_index)
        self._prefixes = set()
        for tok in self.token_to_index:
            for j in range(1, len(tok) + 1):
                self._prefixes.add(tok[:j])

    def encode_bytes(self, src: bytes) -> List[int]:
        out: List[int] = []
        i = 0
        n = len(src)
        t2i = self.token_to_index
        prefixes = self._prefixes
        while i < n:
            best = None
            j = i + 1
            limit = min(n, i + self._max_len)
            while j <= limit:
                chunk = src[i:j]
                if chunk not in prefixes:
                    break
                tid = t2i.get(chunk)
                if tid is not None:
                    best = (j, tid)
                j += 1
            if best is None:
                raise ValueError(f"byte 0x{src[i]:02x} at offset {i} not tokenizable")
            i, tid = best
            out.append(tid)
        return out

    def decode_bytes(self, tokens: List[int]) -> bytes:
        return b"".join(self.index_to_token[int(t)] for t in tokens)

    def encode(self, text: str) -> List[int]:
        return self.encode_bytes(text.encode("utf-8"))

    def decode(self, tokens: List[int]) -> str:
        # 'replace' inserts U+FFFD for partial UTF-8; streaming callers detect
        # it and postpone decoding until the sequence completes (reference
        # rwkv_world_tokenizer.py:112-114 contract)
        return self.decode_bytes(tokens).decode("utf-8", errors="replace")


_world_singleton = None


def get_world_tokenizer() -> Tuple[Callable, Callable]:
    """Returns (decode, encode) for the World v20230424 vocab."""
    global _world_singleton
    if _world_singleton is None:
        _world_singleton = WorldTokenizer()
    return _world_singleton.decode, _world_singleton.encode


def get_20b_tokenizer() -> Tuple[Callable, Callable]:
    import tempfile

    import tokenizers

    gz = os.path.join(_ASSET_DIR, "20B_tokenizer.json.gz")
    with gzip.open(gz, "rb") as f:
        data = f.read()
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tmp:
        tmp.write(data)
        path = tmp.name
    tok = tokenizers.Tokenizer.from_file(path)
    os.unlink(path)
    return tok.decode, lambda s: tok.encode(s).ids


def get_byte_tokenizer() -> Tuple[Callable, Callable]:
    """Raw byte-level tokenizer for the 256-vocab tiny test models
    (extension beyond the reference, which has no CLI path for them)."""
    return (
        lambda toks: bytes(int(t) % 256 for t in toks).decode("utf-8", errors="replace"),
        lambda s: list(s.encode("utf-8")),
    )


def get_tokenizer(name: str, n_vocab: int) -> Tuple[Callable, Callable]:
    """'auto' dispatch by vocab size (tokenizer_util.py:15-38; byte for 256)."""
    if name == "auto":
        if n_vocab == 50277:
            name = "20B"
        elif n_vocab == 65536:
            name = "world"
        elif n_vocab == 256:
            name = "byte"
        else:
            raise ValueError(f"Can not guess the tokenizer from n_vocab value of {n_vocab}")
    if name == "world":
        return get_world_tokenizer()
    if name == "20B":
        return get_20b_tokenizer()
    if name == "byte":
        return get_byte_tokenizer()
    raise ValueError(f"Unknown tokenizer {name}")
