from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warcbase_spark.fixtures import ensure_corpus, make_web_corpus  # noqa: E402
from warcbase_spark.session import get_spark  # noqa: E402

CORPUS_DIR = "/tmp/warcbase_spark_testfix/web500"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="warcbase_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    return make_web_corpus(500)


@pytest.fixture(scope="session")
def corpus_dir(corpus):
    return ensure_corpus(CORPUS_DIR, n_docs=500)
