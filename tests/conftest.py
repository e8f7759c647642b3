from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from jimmy_spark.session import get_spark

    s = get_spark("jimmy-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t1_dir():
    from jimmy_spark.datagen import ensure_dataset

    return str(ensure_dataset("t1"))


@pytest.fixture(scope="session")
def t2_dir():
    from jimmy_spark.datagen import ensure_dataset

    return str(ensure_dataset("t2"))


@pytest.fixture(scope="session")
def t2err_dir():
    from jimmy_spark.datagen import ensure_dataset

    return str(ensure_dataset("t2err"))
