"""Tag-sequence correction operators: TC smoothing, DEL discard, AR rules.

Semantics from the reference: ``smooth_tag_sequence`` (/root/reference/utils.py:868-905),
``is_discarded`` (utils.py:907-931), ``AR_Correcter`` (utils.py:792-866) and its
sliding-window application + anchor-relative positions
(/root/reference/self_train/self_train.py:68-77,134-183).
"""

from __future__ import annotations


def smooth_tag_sequence(tags):
    """BIO repair state machine (utils.py:868-905).

    Category of a tag is its role class: predicate (ends '2P'), attribute
    (ends 'A'), else concept. Rules, given the *previous emitted* tag:
      * concept after predicate/attribute  -> fresh B- of its own role
      * concept after another B/I         -> I- continuation of the PREVIOUS
        role (even across 1C/3C!)
      * predicate after predicate         -> I- continuation
      * attribute after attribute         -> I- continuation of the PREVIOUS
        attribute role (even across 1A/3A)
      * otherwise                         -> fresh B-
    Returns (new_tags, changed_flag); TCDEL drops statements whose flag is set.
    """
    out = ["O"]
    changed = False
    for tag in tags:
        prev = out[-1]
        if tag == "O":
            new = "O"
        elif not tag.endswith("2P") and not tag.endswith("A"):
            if prev.endswith("2P") or prev.endswith("A"):
                new = "B" + tag[1:]
            elif prev.startswith("B") or prev.startswith("I"):
                new = "I" + prev[1:]
            else:
                new = "B" + tag[1:]
        elif tag.endswith("2P"):
            new = ("I" + prev[1:]) if prev.endswith("2P") else ("B" + tag[1:])
        else:  # attribute
            new = ("I" + prev[1:]) if prev.endswith("A") else ("B" + tag[1:])
        if new != tag:
            changed = True
        out.append(new)
    return out[1:], changed


def is_discarded(tags):
    """DEL filter (utils.py:907-931).

    Returns ``(discard, predicate_index_set)``. Discard when the sequence has
    fewer than 3 distinct roles, or an attribute role without its concept
    (orphan 1A/3A). The predicate index set (every token index tagged *2P,
    B and I alike) feeds the fact/condition predicate-overlap filter
    (utils.py:2316-2325).
    """
    roles = set()
    role_types = set()
    predicate_idx = set()
    for i, tag in enumerate(tags):
        if tag == "O":
            continue
        if "2P" in tag:
            predicate_idx.add(i)
        roles.add(tag[3])
        role_types.add(tag[3:])
    if len(roles) < 3:
        return True, predicate_idx
    if "1A" in role_types and "1C" not in role_types:
        return True, predicate_idx
    if "3A" in role_types and "3C" not in role_types:
        return True, predicate_idx
    return False, predicate_idx


def anchor_position(anchors, index):
    """Relative position of ``index`` w.r.t. its nearest anchor index:
    0 on an anchor, -1 left-of, +1 right-of; -1 when no anchors
    (self_train.py:68-77; ties resolved by the LAST equally-near anchor
    because the reference compares with ``<=``)."""
    if index in anchors:
        return 0
    pos = -1
    min_dis = 999
    for a in anchors:
        d = abs(index - a)
        if d <= min_dis:
            min_dis = d
            pos = -1 if index < a else 1
    return pos


def _rule_is_good(tag_sequence):
    """Keep rules spanning >=2 roles including the predicate role '2'
    (utils.py:857-866)."""
    roles = {tag[3] for tag in tag_sequence if tag != "O"}
    return len(roles) >= 2 and "2" in roles


class ARCorrecter:
    """Association-rule store: antecedent POS-context -> consequent tag string.

    Rule lines are ``A-->B#support#confidence`` with tab-joined elements
    (loader utils.py:803-855). Keeps rules with support/confidence above the
    thresholds that pass ``_rule_is_good``; on duplicate antecedents the
    higher-confidence rule wins (first wins ties).
    """

    def __init__(self, fact_lines=(), cond_lines=(), support=3, confidence=0.7):
        self.fact_rules, self.fact_max_len = self._load(fact_lines, support, confidence)
        self.cond_rules, self.cond_max_len = self._load(cond_lines, support, confidence)

    @classmethod
    def from_files(cls, fact_path, cond_path, support=3, confidence=0.7):
        with open(fact_path) as f:
            fact_lines = f.read().splitlines()
        with open(cond_path) as f:
            cond_lines = f.read().splitlines()
        return cls(fact_lines, cond_lines, support, confidence)

    @staticmethod
    def _load(lines, support_th, confidence_th):
        rules = {}
        confs = {}
        max_len = 0
        for line in lines:
            line = line.strip()
            if not line:
                continue
            a_b, support, confidence = line.rsplit("#", 2)
            if int(support) < support_th or float(confidence) < confidence_th:
                continue
            a, b = a_b.split("-->")
            if not _rule_is_good(b.split("\t")):
                continue
            conf = float(confidence)
            if a not in rules or confs[a] < conf:
                rules[a] = b
                confs[a] = conf
        for a in rules:
            max_len = max(max_len, a.count("\t") + 1)
        return rules, max_len


def apply_ar_rules(tags, words_lower, postags, rules, anchors, max_len=None):
    """Longest-first sliding-window rule rewrite (self_train.py:142-183).

    The antecedent for window [j, k) is the POS tags, where an ``IN`` token
    also carries ``:word`` and every element carries ``:relpos`` to the
    nearest anchor (VB* indices for the fact head, IN indices for the
    condition head). On a hit the window's tags are overwritten with the
    consequent and scanning resumes at k.

    ``max_len`` bounds the window length — a pure optimization: the reference
    scans from the full sentence length down, but windows longer than every
    stored antecedent can never match.
    """
    n = len(words_lower)
    tags = list(tags)
    if not rules:
        return tags
    hi_bound = n if max_len is None else max_len
    j = 0
    while j < n:
        matched = False
        for k in range(min(n, j + hi_bound), j, -1):
            parts = []
            for kk in range(j, k):
                ctx = postags[kk]
                if ctx == "IN":
                    ctx += ":" + words_lower[kk]
                ctx += ":" + str(anchor_position(anchors, kk))
                parts.append(ctx)
            key = "\t".join(parts)
            if key in rules:
                tags[j:k] = rules[key].split("\t")
                j = k
                matched = True
                break
        if not matched:
            j += 1
    return tags


def correct_tags(fact_tags, cond_tags, words_lower, postags,
                 ar=None, use_tc=False, use_tcdel=False, use_sh=False,
                 use_del=False, sh_max_len=15):
    """Full correction chain in reference order (self_train.py:117-203):
    SH length filter -> AR rewrite -> TC smoothing -> DEL discard -> TCDEL.

    Returns ``(fact_tags, cond_tags)`` or ``None`` when the statement is
    dropped.
    """
    if use_sh and len(fact_tags) > sh_max_len:
        return None
    if ar is not None:
        vb_idx = [i for i, p in enumerate(postags) if p.startswith("VB")]
        in_idx = [i for i, p in enumerate(postags) if p == "IN"]
        fact_tags = apply_ar_rules(fact_tags, words_lower, postags,
                                   ar.fact_rules, vb_idx, ar.fact_max_len)
        cond_tags = apply_ar_rules(cond_tags, words_lower, postags,
                                   ar.cond_rules, in_idx, ar.cond_max_len)
    if use_tc:
        fact_tags, _ = smooth_tag_sequence(fact_tags)
        cond_tags, _ = smooth_tag_sequence(cond_tags)
    if use_del:
        drop_f, pred_f = is_discarded(fact_tags)
        drop_c, pred_c = is_discarded(cond_tags)
        if drop_f or drop_c or (pred_f & pred_c):
            return None
    if use_tcdel:
        fact_tags, changed_f = smooth_tag_sequence(fact_tags)
        cond_tags, changed_c = smooth_tag_sequence(cond_tags)
        if changed_f or changed_c:
            return None
    return fact_tags, cond_tags
