"""Hash-seed determinism: the decoder's sorted-span fix must make the emitted
tuple multiset identical across CPython hash randomization seeds (the
reference's set iteration is seed-dependent; ours must not be)."""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, sys
from scikg_spark.core.parsing import parse_stmt_blocks, collapse_outputs
from scikg_spark.core.decoder import post_decode
from scikg_spark.core.serialize import serialize_tuple

out = []
with open("/root/reference/data/stmts-eval.tsv") as f:
    for b in parse_stmt_blocks(f):
        fact, cond = collapse_outputs(b["outputs"], len(b["words"]))
        for kind, tags in (("f", fact), ("c", cond)):
            for rec in post_decode(b["words"], tags):
                out.append((b["doc_id"], b["stmt_id"], kind, *serialize_tuple(rec)))
print(json.dumps(sorted(out)))
"""


def _run(seed):
    env = dict(os.environ, PYTHONHASHSEED=str(seed),
               PYTHONPATH="/root/repo")
    res = subprocess.run([sys.executable, "-c", SCRIPT],
                         capture_output=True, text=True, env=env, timeout=120)
    assert res.returncode == 0, res.stderr[-500:]
    return json.loads(res.stdout)


def test_decode_identical_across_hash_seeds():
    if not os.path.exists("/root/reference/data/stmts-eval.tsv"):
        import pytest
        pytest.skip("no reference")
    a = _run(0)
    b = _run(12345)
    c = _run(987654321)
    assert a == b == c
    assert len(a) == 247 + 222
