"""Stage-1 HTML -> text extraction.

The driver-mandated per-row contract (BASELINE.json input_hint): byte-identical
extracted text per url, the SAME pure function used by the plain-Python oracle
and inside the Spark pandas UDF, verified row-for-row. Keep this module tiny,
dependency-free and deterministic — one divergence fails the row-for-row gate.

(The reference has no HTML stage; its closest analog is the ``docid \\t text``
corpus reader, /root/reference/split_and_tokennize_udata.py:36-44.)
"""

from __future__ import annotations

import html as _htmlmod
import re

_SCRIPT_STYLE = re.compile(rb"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_BLOCK_CLOSE = re.compile(
    rb"(?i)</(?:p|div|li|h[1-6]|title|tr|table|ul|ol|blockquote|section|article)\s*>"
    rb"|<br\s*/?\s*>")
_ANY_TAG = re.compile(rb"<[^>]*>")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic HTML -> plain text.

    Rules (fixed, version-pinned):
      1. drop <script>/<style> blocks and comments
      2. block-closing tags and <br> become newlines, every other tag a space
      3. decode UTF-8 (errors='replace'), unescape HTML entities
      4. per line: collapse runs of whitespace to single spaces, strip;
         drop empty lines; join with '\\n'
    """
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, str):
        html_bytes = html_bytes.encode("utf-8")
    raw = _SCRIPT_STYLE.sub(b" ", html_bytes)
    raw = _COMMENT.sub(b" ", raw)
    raw = _BLOCK_CLOSE.sub(b"\n", raw)
    raw = _ANY_TAG.sub(b" ", raw)
    text = raw.decode("utf-8", errors="replace")
    text = _htmlmod.unescape(text)
    lines = []
    for line in text.split("\n"):
        line = " ".join(line.split())
        if line:
            lines.append(line)
    return "\n".join(lines)


def wrap_html(lines, title="") -> bytes:
    """Render text lines as a minimal page such that
    ``extract_text(wrap_html(lines, title)) == '\\n'.join([title] + lines)``
    (title line omitted when empty) for single-spaced, newline-free lines.
    Used by the synthetic corpus generator."""
    esc = _htmlmod.escape
    body = "".join(f"<p>{esc(line)}</p>" for line in lines)
    page = (
        f"<html><head><title>{esc(title)}</title>"
        f"<script>var x=1;</script></head><body>{body}</body></html>"
    )
    return page.encode("utf-8")
