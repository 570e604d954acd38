from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nt_etl_order_book_spark.session import get_spark
from nt_etl_order_book_spark.tables import sf_path

SF_DIR = sf_path("0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark_prop():
    # Property tests run many tiny jobs: minimal parallelism is faster.
    s = get_spark("tests", shuffle_partitions=2)
    yield s
