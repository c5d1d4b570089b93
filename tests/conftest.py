from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_etl_pipeline_woocommerce_spark.session import get_spark

#: single point of configuration for all testdata paths (a few
#: recall/property tests need the bigger sf0.01 tables)
TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIR = f"{TESTDATA_ROOT}/sf0.001"
SF01_DIR = f"{TESTDATA_ROOT}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf01_dir():
    return SF01_DIR
