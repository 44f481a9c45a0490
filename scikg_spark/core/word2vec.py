"""word2vec binary-format reader/writer (S5 — the reference loads
``pubmed-vectors=50.bin`` through gensim, load_pretrained_word_embeddings.py:47-63;
the blob itself is not shipped).

The classic word2vec C binary format is public and trivial: an ASCII header
``"<vocab_size> <dim>\\n"``, then per word the token bytes terminated by a
space, followed by ``dim`` little-endian float32s (optionally a trailing
newline). This reader makes the engine consume REAL pretrained vectors the
moment a blob is available: pass the resulting (matrix, word2id) as the
broadcast embedding table in place of the hashing-trick stand-in.
"""

from __future__ import annotations

import struct

import numpy as np


def read_word2vec_bin(path: str, max_words: int | None = None):
    """-> (matrix float32 [n, dim], word2id dict). Adds <pad> row 0 and
    <unk> row 1, mirroring the reference's padded table (utils.py:155-169)."""
    with open(path, "rb") as f:
        header = f.readline().decode("utf-8").strip()
        vocab_size, dim = (int(x) for x in header.split())
        n = vocab_size if max_words is None else min(vocab_size, max_words)
        matrix = np.zeros((n + 2, dim), dtype=np.float32)
        word2id = {"<pad>": 0, "<unk>": 1}
        for i in range(n):
            chars = bytearray()
            while True:
                ch = f.read(1)
                if ch in (b" ", b""):
                    break
                if ch != b"\n":  # some writers prepend newlines
                    chars.extend(ch)
            word = chars.decode("utf-8", errors="replace")
            vec = np.frombuffer(f.read(4 * dim), dtype="<f4")
            matrix[i + 2] = vec
            word2id[word] = i + 2
    return matrix, word2id


def write_word2vec_bin(path: str, words, matrix) -> None:
    """Inverse writer (fixtures / interchange)."""
    matrix = np.asarray(matrix, dtype="<f4")
    assert len(words) == len(matrix)
    with open(path, "wb") as f:
        f.write(f"{len(words)} {matrix.shape[1]}\n".encode())
        for word, vec in zip(words, matrix):
            f.write(word.encode("utf-8") + b" ")
            f.write(struct.pack(f"<{matrix.shape[1]}f", *vec))
            f.write(b"\n")


def lookup_vectors(words, matrix, word2id):
    """Batch lookup with <unk> fallback (utils.py:234-241 OOV behavior)."""
    ids = [word2id.get(w.lower(), 1) for w in words]
    return matrix[ids]
