from __future__ import annotations

import pytest

from file_dedup_rust_spark.config import DedupConfig
from file_dedup_rust_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> DedupConfig:
    # small band_cap exercised separately; defaults here
    return DedupConfig()
