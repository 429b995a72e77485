from __future__ import annotations

import pytest

from pincspark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pincspark-tests", cpus=8)
    yield s
