import duckdb
import pytest
import ray
import ray.data

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _reap_actor_pools():
    """Ray Data actor pools release their CPUs only when the Dataset object
    is garbage-collected; without this, a leaked pool from one test starves
    the next pipeline's tasks at num_cpus=4 (observed deadlock)."""
    yield
    import gc

    gc.collect()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def make_oracle_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata tables registered as views
    (mirrors the driver's correctness harness)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="session")
def oracle(sf_dir):
    return make_oracle_con(sf_dir)
