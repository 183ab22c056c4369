import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: scale-proof tests (bigger synthetic corpora)"
    )


@pytest.fixture(scope="session")
def spark():
    from go_readability_spark.spark.session import build_session

    s = build_session(cpus=4, app_name="tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
