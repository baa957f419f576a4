from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semstreams_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_small(spark):
    from semstreams_spark.datagen import ensure_transcripts, transcripts_path

    ensure_transcripts(0.001)
    return spark.read.parquet(transcripts_path(0.001))
