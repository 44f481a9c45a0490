"""Fixed tag vocabularies (from /root/reference/resources/*.txt, loaded by
utils.py:130-134). Inlined as literals: they are part of the task definition,
not data."""

FACT_TAGS = [
    "O", "B-f1C", "B-f2P", "B-f3C", "B-f1A", "B-f3A",
    "I-f1C", "I-f2P", "I-f3C", "I-f1A", "I-f3A",
]
COND_TAGS = [
    "O", "B-c1C", "B-c2P", "B-c3C", "B-c1A", "B-c3A",
    "I-c1C", "I-c2P", "I-c3C", "I-c1A", "I-c3A",
]
CAP_TAGS = ["O", "B-C", "I-C", "B-P", "I-P", "B-A", "I-A"]
POS_TAGS = [
    "CC", "CD", "DT", "EX", "FW", "IN", "JJ", "JJR", "JJS", "LS", "MD",
    "NN", "NNS", "NNP", "NNPS", "PDT", "POS", "PRP", "PRP$", "RB", "RBR",
    "RBS", "RP", "TO", "UH", "VB", "VBD", "VBG", "VBN", "VBP", "VBZ",
    "WDT", "WP", "WP$", "WRB", "SYM",
]

FACT_TAG2ID = {t: i for i, t in enumerate(FACT_TAGS)}
COND_TAG2ID = {t: i for i, t in enumerate(COND_TAGS)}
CAP_TAG2ID = {t: i for i, t in enumerate(CAP_TAGS)}
POS_TAG2ID = {t: i for i, t in enumerate(POS_TAGS)}
POS_SET = set(POS_TAGS)
