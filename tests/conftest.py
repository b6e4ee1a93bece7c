from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_check import default_sf_dir

SF_DIR = default_sf_dir()


@pytest.fixture(scope="session", autouse=True)
def _scratch_root(tmp_path_factory):
    """Route catalog scratch dirs into pytest's managed tmp (ADVICE r8):
    tests that build derived artifacts (ANN indexes, layouts) from
    tmp_path fixtures otherwise leave one never-reused
    /tmp/lstore_spark_* dir per run.  pytest prunes its own basetemp,
    so the leak class is gone; intra-run reuse/gating still works."""
    root = str(tmp_path_factory.mktemp("lstore_scratch"))
    prev = os.environ.get("LSTORE_SPARK_SCRATCH_ROOT")
    os.environ["LSTORE_SPARK_SCRATCH_ROOT"] = root
    yield root
    if prev is None:
        os.environ.pop("LSTORE_SPARK_SCRATCH_ROOT", None)
    else:
        os.environ["LSTORE_SPARK_SCRATCH_ROOT"] = prev


@pytest.fixture(scope="session")
def spark():
    from lstore_spark.session import get_spark
    s = get_spark("lstore-spark-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_check import duck_connect
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
