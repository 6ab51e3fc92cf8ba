import pytest

from ocr_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="ocr_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield session
    session.stop()
