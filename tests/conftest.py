import pytest


@pytest.fixture(scope="session")
def spark():
    from geotrellis_spark.session import get_spark

    s = get_spark("geotrellis-spark-tests", cores=4, shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()
