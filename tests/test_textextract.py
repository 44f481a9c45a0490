"""Stage-1 extractor: deterministic, byte-stable HTML -> text."""

from scikg_spark.core.textextract import extract_text, wrap_html


def test_roundtrip():
    lines = ["Cats eat fish.", "T cells & B cells <interact>."]
    assert extract_text(wrap_html(lines)) == "\n".join(lines)
    assert extract_text(wrap_html(lines, title="doc")) == "\n".join(["doc"] + lines)


def test_script_style_comment_dropped():
    html = (b"<html><head><style>p{color:red}</style></head>"
            b"<body><script>alert('x')</script><!-- c --><p>keep me</p></body></html>")
    assert extract_text(html) == "keep me"


def test_entities_and_whitespace():
    html = b"<p>a &amp; b</p><p>  c   d  </p>"
    assert extract_text(html) == "a & b\nc d"


def test_br_and_inline_tags():
    html = b"<p>one<br>two <b>bold</b> end</p>"
    assert extract_text(html) == "one\ntwo bold end"


def test_none_and_str_inputs():
    assert extract_text(None) == ""
    assert extract_text("<p>x</p>") == "x"


def test_invalid_utf8_replaced_deterministically():
    html = b"<p>ok \xff\xfe</p>"
    out1 = extract_text(html)
    out2 = extract_text(html)
    assert out1 == out2 and out1.startswith("ok")
