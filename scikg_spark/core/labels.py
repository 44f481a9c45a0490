"""Label-file DSL parsing and trie-based mention detection (gold BIO builder).

Formats and semantics from the reference label pipeline:
  * label DSL  (parser /root/reference/utils.py:617-725; format doc
    data/stmtextract.py:1-5): lines ``n1 [a,as,b]``, ``h1 [a,contain,b]``,
    ``f1 [subj,pred#off,obj]``, ``c1 [...]``, ``stmt<k> = f1 c2 ... (note)``;
    subj/obj are ``NIL`` | ``phrase#off`` | ``{C#off:A#off}``; ``@`` escapes
    ``,`` inside phrases.
  * trie longest-match mention scan (data/stmtextract.py:374-434): greedy,
    longest-first, offset-anchored — a B/I label is only emitted when the
    match position equals the tuple's recorded token offset.
"""

from __future__ import annotations


def parse_label_file(lines):
    """Parse one label file -> (nid2tuple, hid2tuple, fid2tuple, cid2tuple,
    sid2stmts), mirroring utils.py:617-725.

    f/c tuples are ``[subj, pred, obj]`` where subj/obj is ``['N','NIL']`` |
    ``['C', 'phrase#off']`` | ``['A', 'c_phrase#off', 'a_phrase#off']`` and
    pred is ``'phrase#off'``. sid2stmts maps stmt id -> list of
    ``[fact_ids, cond_ids, note]``.
    """
    nid2tuple, hid2tuple, fid2tuple, cid2tuple, sid2stmts = {}, {}, {}, {}, {}

    def parse_endpoint(token):
        if ":" in token:
            inner = token[1:-1].split(":")
            assert len(inner) == 2
            return ["A", inner[0], inner[1]]
        if token == "NIL":
            return ["N", token]
        return ["C", token]

    for line in lines:
        text = line.strip()
        if not text or text[0] == "#":
            continue
        head = text[0]
        if head in "nh":
            pos = text.find("[")
            arr = text[pos + 1:-1].split(",")
            assert len(arr) == 3
            target = nid2tuple if head == "n" else hid2tuple
            target[text[:pos - 1]] = [["C", arr[0]], arr[1], ["C", arr[2]]]
        elif head in "fc":
            pos = text.find("[")
            arr = text[pos + 1:-1].split(",")
            assert len(arr) == 3
            rec = [parse_endpoint(arr[0]), arr[1], parse_endpoint(arr[2])]
            target = fid2tuple if head == "f" else cid2tuple
            _id = text[:pos - 1]
            assert _id not in target
            target[_id] = rec
        elif head == "s":
            if text[:4] == "stmt":
                arr = text.split(" ")
                assert arr[1] == "="
                stmt = [[], [], "NIL"]
                for token in arr[2:]:
                    if token[0] == "f":
                        stmt[0].append(token)
                    elif token[0] == "c":
                        stmt[1].append(token)
                    elif token[0] == "(" and token[-1] == ")":
                        stmt[2] = token[1:-1]
                    else:
                        raise ValueError(token)
                sid = int(arr[0][4:])
                sid2stmts.setdefault(sid, []).append(stmt)
            elif text[:4] == "s???":
                continue
            else:
                raise ValueError(text)
        else:
            raise ValueError(text)
    return nid2tuple, hid2tuple, fid2tuple, cid2tuple, sid2stmts


def phrase_symbols_for_stmt(stmt, fid2tuple, cid2tuple, hid2tuple):
    """Collect ``phrase -> [[tid, role, off], ...]`` for one statement
    (data/stmtextract.py:310-372). Attribute endpoints contribute both their
    concept (role 1C/3C, unless NIL) and attribute (1A/3A) phrases; hypernym
    tuples are probed too but their ``contain`` predicate is never indexed."""
    phrase2symbols = {}

    def add(phrase_off, tid, role, skip_nil=False, skip_phrase=None):
        phrase, off = phrase_off.split("#")
        phrase = phrase.replace("@", ",")
        if skip_nil and phrase == "NIL":
            return
        if skip_phrase is not None and phrase == skip_phrase:
            return
        phrase2symbols.setdefault(phrase, []).append([tid, role, off])

    id_tuple = [[fid, fid2tuple[fid]] for fid in stmt[0]]
    id_tuple += [[cid, cid2tuple[cid]] for cid in stmt[1]]
    id_tuple += [[hid, t] for hid, t in hid2tuple.items()]

    for tid, rec in id_tuple:
        subj, pred, obj = rec
        if subj[0] == "C":
            add(subj[1], tid, "1C")
        elif subj[0] == "A":
            add(subj[1], tid, "1C", skip_nil=True)
            add(subj[2], tid, "1A")
        add(pred, tid, "2P", skip_phrase="contain")
        if obj[0] == "C":
            add(obj[1], tid, "3C")
        elif obj[0] == "A":
            add(obj[1], tid, "3C", skip_nil=True)
            add(obj[2], tid, "3A")
    return phrase2symbols, [tid for tid, _ in id_tuple]


def build_phrase_index(phrase2symbols):
    """Length-bucketed word trie: ``index[n-1]`` holds n-word phrases as nested
    word dicts whose leaf is the symbol list (data/stmtextract.py:374-392)."""
    index = [{}]
    for phrase, symbols in phrase2symbols.items():
        words = phrase.split("_")
        n = len(words)
        while len(index) < n:
            index.append({})
        node = index[n - 1]
        for w in words[:-1]:
            node = node.setdefault(w, {})
        node[words[-1]] = symbols
    return index


def match_mentions(words_lower, phrase_index, tids):
    """Greedy longest-first offset-anchored scan (data/stmtextract.py:395-434).

    Returns ``(tid2tags, tid2nlabel)``: per-tuple BIO rows over the statement
    (tags like ``B-f1C`` from ``tid[0] + role``) and per-tuple hit counts.
    """
    n = len(words_lower)
    tid2tags = {tid: ["O"] * n for tid in tids}
    tid2nlabel = {}
    nindex = len(phrase_index)
    i = 0
    while i < n:
        found = False
        for j in range(min(nindex, n - i), 0, -1):
            node = phrase_index[j - 1]
            k = 0
            while k < j and i + k < n:
                w = words_lower[i + k]
                if w not in node:
                    break
                node = node[w]
                k += 1
            if k == j:
                symbols = node
                for tid, _label, _off in symbols:
                    tid2nlabel[tid] = tid2nlabel.get(tid, 0) + 1
                for pos in range(i, i + k):
                    marker = "B-" if pos == i else "I-"
                    for tid, label, off in symbols:
                        if i == int(off):
                            tid2tags[tid][pos] = marker + tid[0] + label
                i += k
                found = True
                break
        if not found:
            i += 1
    return tid2tags, tid2nlabel
