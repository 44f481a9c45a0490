"""Pure-Python semantic core (no Spark imports).

Everything here is a deterministic function over plain lists/tuples so it can
be (a) unit-tested in isolation against the reference's gold data and
(b) imported inside vectorized pandas UDFs by scikg_spark.pipeline.
"""

from scikg_spark.core.decoder import NIL, extract_spans, post_decode  # noqa: F401
from scikg_spark.core.correct import (  # noqa: F401
    smooth_tag_sequence,
    is_discarded,
    ARCorrecter,
    apply_ar_rules,
    anchor_position,
)
from scikg_spark.core.metrics import match_score  # noqa: F401
from scikg_spark.core.serialize import serialize_tuple  # noqa: F401
