import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from runyoro_llm_data_pipeline_spark.session import get_spark  # noqa: E402

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def shared_spark_holder(spark):
    """Function-scoped alias usable inside @given (hypothesis forbids
    function-scoped fixtures; session scope is fine)."""
    return spark


@pytest.fixture()
def tmp_lake(tmp_path_factory):
    d = tmp_path_factory.mktemp("lake")
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


def sf_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"
