import pytest

from smh_to_jsonld_spark.session import get_spark
from smh_to_jsonld_spark.sources import synth


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def spec():
    return synth.corpus_spec()
