from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("trafsys-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
