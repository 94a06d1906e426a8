from __future__ import annotations

import shutil
import tempfile

import pytest

from information_extraction_spark.fixtures import (
    build_world,
    compute_golden,
    generate_transcripts,
)
from information_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ie-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def world():
    return build_world()


@pytest.fixture(scope="session")
def transcripts_pdf(world):
    return generate_transcripts(world, n_convs=40)


@pytest.fixture(scope="session")
def golden_pdf(world, transcripts_pdf):
    return compute_golden(world, transcripts_pdf)


@pytest.fixture(scope="session")
def tmp_dir():
    d = tempfile.mkdtemp(prefix="ie_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
