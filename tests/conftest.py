import os

import pytest

REFERENCE = "/root/reference"
TESTDATA = "/root/testdata"


def reference_path(*parts):
    return os.path.join(REFERENCE, *parts)


@pytest.fixture(scope="session")
def eval_blocks():
    """The reference's held-out extraction test set (142 statements)."""
    from scikg_spark.core.parsing import parse_stmt_blocks

    path = reference_path("data", "stmts-eval.tsv")
    if not os.path.exists(path):
        pytest.skip("reference gold data not available")
    with open(path) as f:
        return list(parse_stmt_blocks(f))


@pytest.fixture(scope="session")
def train_blocks():
    from scikg_spark.core.parsing import parse_stmt_blocks

    path = reference_path("data", "stmts-train.tsv")
    if not os.path.exists(path):
        pytest.skip("reference gold data not available")
    with open(path) as f:
        return list(parse_stmt_blocks(f))


@pytest.fixture(scope="session")
def spark():
    from scikg_spark.pipeline.session import get_spark

    spark = get_spark(app_name="scikg-tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
