"""Prior-tag binary scan (S7): packed little-endian float32 streams of
per-token 11-way tag distributions, one fact file + one condition file,
token-major (reference loader ``DataCenter.load_prior_tag``,
/root/reference/utils.py:554-615).
"""

from __future__ import annotations

import struct

N_TAGS = 11


def read_prior_tags(path: str, class_num: int = N_TAGS) -> list[list[float]]:
    """Binary file -> list of per-token ``class_num``-way distributions."""
    with open(path, "rb") as f:
        data = f.read()
    n = len(data) // 4
    if n % class_num:
        raise ValueError(
            f"{path}: {n} floats is not a multiple of class_num={class_num}")
    floats = struct.unpack(f"<{n}f", data)
    return [list(floats[i:i + class_num]) for i in range(0, n, class_num)]


def write_prior_tags(path: str, distribs) -> None:
    """Inverse of :func:`read_prior_tags` (fixture/interchange writer)."""
    flat = [v for d in distribs for v in d]
    with open(path, "wb") as f:
        f.write(struct.pack(f"<{len(flat)}f", *flat))


def align_priors_to_statements(distribs, statements_tokens):
    """Distribute the token-major prior stream across statements, mirroring
    the reference's token_index walk (utils.py:602-613). Returns one
    (fact-shaped) list of per-token distributions per statement."""
    out = []
    idx = 0
    for tokens in statements_tokens:
        n = len(tokens)
        if idx + n > len(distribs):
            raise ValueError("prior stream shorter than the token stream")
        out.append(distribs[idx:idx + n])
        idx += n
    if idx != len(distribs):
        raise ValueError(
            f"prior stream has {len(distribs) - idx} unconsumed distributions")
    return out
